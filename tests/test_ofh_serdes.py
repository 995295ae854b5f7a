"""O-RAN fronthaul framing: eCPRI + U-plane serdes and receive checkers.

reference: lib/ofh/ecpri/*, lib/ofh/serdes/ofh_uplane_message_builder_impl.cpp,
lib/ofh/receiver/{ofh_sequence_id_checker_impl.h, ofh_rx_window_checker.cpp}.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from srsran_projectvtlmo_tpu.ofh import (
    EcpriIqPacket,
    EcpriRtControlPacket,
    build_iq_data_packet,
    build_rt_control_packet,
    decode_packet,
    UplaneMessageParams,
    build_uplane_message,
    decode_uplane_message,
    SequenceIdChecker,
    RxWindowChecker,
)
from srsran_projectvtlmo_tpu.ofh.uplane import COMP_BFP, COMP_NONE
from srsran_projectvtlmo_tpu.ops.ofh_compression import (
    bfp_compress,
    bfp_decompress,
    pack_prbs,
    unpack_prbs,
)
from srsran_projectvtlmo_tpu.ran.slot import SlotPoint


def test_ecpri_iq_roundtrip():
    pkt = build_iq_data_packet(pc_id=0x1234, seq_id=0xABCD, payload=b"\x01\x02\x03")
    # Common header: revision 1 in the high nibble, type 0, size = 4 + payload.
    assert pkt[0] == 0x10 and pkt[1] == 0x00
    assert int.from_bytes(pkt[2:4], "big") == 4 + 3
    out = decode_packet(pkt)
    assert isinstance(out, EcpriIqPacket)
    assert (out.pc_id, out.seq_id, out.payload) == (0x1234, 0xABCD, b"\x01\x02\x03")


def test_ecpri_rt_control_roundtrip():
    pkt = build_rt_control_packet(rtc_id=7, seq_id=300, payload=b"zz")
    out = decode_packet(pkt)
    assert isinstance(out, EcpriRtControlPacket)
    assert (out.rtc_id, out.seq_id, out.payload) == (7, 300 & 0xFFFF, b"zz")


def test_ecpri_rejects_malformed():
    with pytest.raises(ValueError):
        decode_packet(b"\x10\x00")  # short
    good = bytearray(build_iq_data_packet(1, 2, b""))
    good[0] = 0x20  # wrong revision
    with pytest.raises(ValueError):
        decode_packet(bytes(good))


@pytest.mark.parametrize("static", [True, False])
def test_uplane_bfp_roundtrip(static):
    """Full path: IQ -> device BFP compress+pack -> frame -> decode -> device
    unpack+decompress -> IQ within BFP quantization error."""
    rng = np.random.default_rng(3)
    nof_prb, width = 24, 9
    iq = rng.uniform(-0.5, 0.5, size=(nof_prb * 12, 2)).astype(np.float32)
    mant, exp = bfp_compress(jnp.asarray(iq).reshape(nof_prb, 12, 2)[None], width)
    payload = np.asarray(pack_prbs(mant, width, exp))[0]

    params = UplaneMessageParams(slot=SlotPoint(1, 123), symbol_id=5,
                                 start_prb=10, nof_prb=nof_prb,
                                 data_width=width, comp_type=COMP_BFP,
                                 static_compression=static)
    msg = build_uplane_message(params, payload)
    dec = decode_uplane_message(msg, static_width=width if static else None)
    assert dec.symbol_id == 5 and dec.start_prb == 10 and dec.nof_prb == nof_prb
    assert dec.data_width == width and dec.comp_type == COMP_BFP
    sp = SlotPoint(1, 123)
    assert dec.frame_id == sp.sfn % 256
    assert dec.subframe_id == sp.subframe_index
    assert dec.slot_id == sp.slot_in_subframe

    mant2, exp2 = unpack_prbs(jnp.asarray(dec.prb_payload)[None], width, True)
    np.testing.assert_array_equal(np.asarray(mant2), np.asarray(mant))
    np.testing.assert_array_equal(np.asarray(exp2), np.asarray(exp))
    rec = np.asarray(bfp_decompress(mant2, width, exponents=exp2))[0]
    np.testing.assert_allclose(rec.reshape(nof_prb * 12, 2), iq, atol=2 ** -6)


def test_uplane_payload_shape_check():
    params = UplaneMessageParams(slot=SlotPoint(1, 0), symbol_id=0,
                                 start_prb=0, nof_prb=4)
    with pytest.raises(ValueError):
        build_uplane_message(params, np.zeros((4, 3), np.uint8))


def test_sequence_id_checker():
    c = SequenceIdChecker()
    assert c.update_and_compare(0, 10) == 0  # first is always in order
    assert c.update_and_compare(0, 11) == 0
    assert c.update_and_compare(0, 14) == 2  # two lost -> resync
    assert c.update_and_compare(0, 15) == 0
    assert c.update_and_compare(0, 14) == -2  # from the past: no resync
    assert c.update_and_compare(0, 16) == 0
    # Wraparound 255 -> 0.
    c2 = SequenceIdChecker()
    assert c2.update_and_compare(3, 255) == 0
    assert c2.update_and_compare(3, 0) == 0
    # Independent per eAxC.
    assert c.update_and_compare(1, 99) == 0


def test_rx_window_checker():
    w = RxWindowChecker(numerology=1, sym_start=0, sym_end=3)
    w.on_new_symbol(sfn=10, slot_index=4, symbol=7)
    assert w.check(10, 4, 7) == "on_time"   # diff 0
    assert w.check(10, 4, 5) == "on_time"   # diff 2, within window
    assert w.check(10, 4, 2) == "late"      # diff 5 > sym_end
    assert w.check(10, 4, 9) == "early"     # diff -2 < sym_start
    assert w.stats.on_time == 2 and w.stats.late == 1 and w.stats.early == 1
    # SFN wrap at 256: OTA at sfn 0 vs message from sfn 255 is a small diff.
    w2 = RxWindowChecker(numerology=1, sym_start=0, sym_end=3)
    w2.on_new_symbol(sfn=256, slot_index=0, symbol=1)
    assert w2.check(255, 19, 13) == "on_time"  # 2 symbols earlier across wrap
