"""OFH C-plane serdes, Ethernet/VLAN framing, eAxC packing, tx window."""

import numpy as np
import pytest

from srsran_projectvtlmo_tpu.ofh import cplane, ethernet
from srsran_projectvtlmo_tpu.ofh.ecpri import (
    build_rt_control_packet, decode_packet,
)


class TestCplane:
    def test_type1_roundtrip(self):
        hdr = cplane.CplaneRadioHeader(
            direction=cplane.DIRECTION_DL, sfn=57, subframe=3, slot=1,
            start_symbol=2)
        sec = cplane.CplaneCommonSection(section_id=0x123, prb_start=40,
                                         nof_prb=106, re_mask=0xFFF,
                                         nof_symbols=12)
        msg = cplane.build_type1_message(hdr, sec)
        dec = cplane.decode_message(msg)
        assert dec.section_type == 1
        assert dec.header == hdr
        assert dec.section == sec

    def test_type1_all_prb_encoding(self):
        """nof_prb > 255 encodes as 0 = every PRB (reference
        serialize_section_0_1_3_5_fields)."""
        hdr = cplane.CplaneRadioHeader(cplane.DIRECTION_DL, 0, 0, 0, 0)
        sec = cplane.CplaneCommonSection(1, 0, 273)
        dec = cplane.decode_message(cplane.build_type1_message(hdr, sec))
        assert dec.section.nof_prb == 0  # all-PRB marker

    def test_type3_prach(self):
        hdr = cplane.CplaneRadioHeader(
            cplane.DIRECTION_UL, 12, 9, 0, 0,
            filter_index=cplane.FILTER_PRACH_LONG)
        sec = cplane.CplaneCommonSection(7, 4, 6, nof_symbols=1)
        p3 = cplane.CplaneSection3Params(time_offset=1024,
                                         frame_structure_fft=12,
                                         scs_hz=1.25e3, cp_length=3168)
        msg = cplane.build_type3_message(hdr, sec, p3)
        dec = cplane.decode_message(msg)
        assert dec.section_type == 3
        assert dec.header.filter_index == cplane.FILTER_PRACH_LONG
        assert dec.section.prb_start == 4

    def test_type0_idle_guard(self):
        hdr = cplane.CplaneRadioHeader(cplane.DIRECTION_DL, 1, 2, 3, 0)
        sec = cplane.CplaneCommonSection(9, 0, 51)
        dec = cplane.decode_message(cplane.build_type0_message(hdr, sec))
        assert dec.section_type == 0 and dec.section.section_id == 9

    def test_slot_field_split(self):
        """The 6-bit slot id splits 4 MSB / 2 LSB across bytes."""
        hdr = cplane.CplaneRadioHeader(cplane.DIRECTION_UL, 255, 9, 13, 63)
        sec = cplane.CplaneCommonSection(0, 0, 1)
        dec = cplane.decode_message(cplane.build_type1_message(hdr, sec))
        assert dec.header.slot == 13 and dec.header.start_symbol == 63
        assert dec.header.subframe == 9 and dec.header.sfn == 255


class TestEthernet:
    def test_vlan_frame_roundtrip(self):
        params = ethernet.VlanFrameParams(
            mac_dst=bytes.fromhex("aabbccddeeff"),
            mac_src=bytes.fromhex("112233445566"),
            tci=(5 << 13) | 42)  # PCP 5, VLAN 42
        payload = bytes(range(64))
        frame = ethernet.build_vlan_frame(params, payload)
        dec = ethernet.decode_vlan_frame(frame)
        assert dec.mac_dst == params.mac_dst
        assert dec.eth_type == ethernet.ECPRI_ETH_TYPE
        assert dec.tci == params.tci
        assert dec.payload == payload

    def test_min_frame_padding(self):
        params = ethernet.VlanFrameParams(b"\x00" * 6, b"\x01" * 6, 1)
        frame = ethernet.build_vlan_frame(params, b"\xab")
        assert len(frame) == ethernet.MIN_FRAME_SIZE

    def test_cplane_over_ecpri_over_vlan(self):
        """Full DL C-plane egress: C-plane -> eCPRI type 2 -> VLAN frame."""
        hdr = cplane.CplaneRadioHeader(cplane.DIRECTION_DL, 3, 1, 0, 0)
        sec = cplane.CplaneCommonSection(1, 0, 106)
        cp = cplane.build_type1_message(hdr, sec)
        eaxc = ethernet.eaxc_pc_id(0, 1, 2, 3)
        pkt = build_rt_control_packet(eaxc, seq_id=7, payload=cp)
        frame = ethernet.build_vlan_frame(
            ethernet.VlanFrameParams(b"\x02" * 6, b"\x04" * 6, 2), pkt)
        inner = ethernet.decode_vlan_frame(frame)
        decoded = decode_packet(inner.payload[:len(pkt)])
        assert decoded.rtc_id == eaxc and decoded.seq_id == 7
        got = cplane.decode_message(decoded.payload)
        assert got.section.nof_prb == 106

    def test_eaxc_pack_unpack(self):
        pc = ethernet.eaxc_pc_id(1, 20, 3, 9)
        assert ethernet.eaxc_unpack(pc) == (1, 20, 3, 9)


class TestTxWindow:
    def test_late_grid_detection(self):
        w = ethernet.TxWindowChecker(advance_time_in_symbols=4)
        w.on_new_symbol(slot=10, symbol=0)
        assert not w.is_late(11)   # a full slot ahead
        assert w.is_late(10)       # needs 4 symbols of advance: too late
        w.on_new_symbol(slot=10, symbol=11)
        assert w.is_late(11)       # 14-4 = symbol 10 was the deadline
        assert w.nof_late == 2
