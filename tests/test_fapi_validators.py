"""FAPI PDU/message validator tests (reference: lib/fapi/validators/*)."""

from srsran_projectvtlmo_tpu.fapi import pdus, validators
from srsran_projectvtlmo_tpu.ran.modulation import Modulation


def good_pdsch(**kw):
    base = dict(rnti=0x4601, rb_start=0, rb_size=52, modulation=Modulation.QAM64,
                target_code_rate=0.5, rv=0, nof_layers=1, start_symbol=2,
                nof_symbols=12, dmrs_symbols=(4,), n_id=1)
    base.update(kw)
    return pdus.PdschPdu(**base)


def good_pusch(**kw):
    base = dict(rnti=0x4601, rb_start=10, rb_size=24, modulation=Modulation.QAM16,
                target_code_rate=0.5, harq_id=3, rv=0, start_symbol=0,
                nof_symbols=14, dmrs_symbols=(2,))
    base.update(kw)
    return pdus.PuschPdu(**base)


def test_valid_dl_tti_passes():
    req = pdus.DlTtiRequest(
        slot=0,
        ssb=(pdus.SsbPdu(phys_cell_id=1, ssb_block_index=0, sfn=0,
                         half_radio_frame=False),),
        pdcch=(pdus.PdcchPdu(rnti=0x4601, nof_dci_bits=40, aggregation_level=4,
                             cce_index=0, start_symbol=0),),
        pdsch=(good_pdsch(),))
    rep = validators.validate_dl_tti_request(req)
    assert rep.ok, [str(e) for e in rep.errors]


def test_pdsch_rb_overflow_flagged():
    rep = validators.ValidatorReport()
    validators.validate_pdsch(good_pdsch(rb_start=270, rb_size=20), rep)
    assert not rep.ok
    assert any("RB Start + RB Size" in e.field_name for e in rep.errors)


def test_pdsch_bad_rv_and_symbols():
    rep = validators.ValidatorReport()
    validators.validate_pdsch(good_pdsch(rv=4, start_symbol=10, nof_symbols=8), rep)
    names = [e.field_name for e in rep.errors]
    assert "RV Index" in names
    assert any("Start symbol + Nr of symbols" in n for n in names)


def test_pdsch_dmrs_outside_allocation():
    # DM-RS positions are absolute: symbol 0 sits before a start_symbol=2
    # allocation, symbol 14 past the slot.
    for bad_sym in (0, 14):
        rep = validators.ValidatorReport()
        validators.validate_pdsch(good_pdsch(dmrs_symbols=(bad_sym,)), rep)
        assert any("DMRS" in e.field_name for e in rep.errors), bad_sym


def test_pusch_new_data_requires_rv0():
    rep = validators.ValidatorReport()
    validators.validate_pusch(good_pusch(new_data=True, rv=2), rep)
    assert any(e.field_name == "RV Index" for e in rep.errors)
    rep2 = validators.ValidatorReport()
    validators.validate_pusch(good_pusch(new_data=False, rv=2), rep2)
    assert rep2.ok, [str(e) for e in rep2.errors]


def test_pusch_layer_limit():
    rep = validators.ValidatorReport()
    validators.validate_pusch(good_pusch(nof_layers=5), rep)
    assert any(e.field_name == "Number of layers" for e in rep.errors)


def test_pucch_format_constraints():
    rep = validators.ValidatorReport()
    validators.validate_pucch(pdus.PucchPdu(format=0, rnti=1, prb_start=0,
                                            nof_prb=2, start_symbol=0,
                                            nof_symbols=1), rep)
    assert any("PRB size" in e.field_name for e in rep.errors)
    rep2 = validators.ValidatorReport()
    validators.validate_pucch(pdus.PucchPdu(format=3, rnti=1, prb_start=0,
                                            nof_prb=1, start_symbol=0,
                                            nof_symbols=4), rep2)
    assert any("PUCCH format" in e.field_name for e in rep2.errors)
    rep3 = validators.ValidatorReport()
    validators.validate_pucch(pdus.PucchPdu(format=2, rnti=1, prb_start=0,
                                            nof_prb=4, start_symbol=12,
                                            nof_symbols=2, nof_uci_bits=11), rep3)
    assert rep3.ok, [str(e) for e in rep3.errors]


def test_prach_root_range_depends_on_format():
    rep = validators.ValidatorReport()
    validators.validate_prach(pdus.PrachPdu(format_is_long=False,
                                            root_sequence_index=200), rep)
    assert any("Root sequence" in e.field_name for e in rep.errors)
    rep2 = validators.ValidatorReport()
    validators.validate_prach(pdus.PrachPdu(format_is_long=True,
                                            root_sequence_index=200), rep2)
    assert rep2.ok


def test_tx_data_pairing():
    dl = pdus.DlTtiRequest(slot=5, pdsch=(good_pdsch(),))
    tx = pdus.TxDataRequest(slot=5, tb_bits=[])
    rep = validators.validate_tx_data_request(tx, dl)
    assert any("Nr of TBs" in e.field_name for e in rep.errors)


def test_error_formatting():
    rep = validators.ValidatorReport()
    validators.validate_pdsch(good_pdsch(rnti=0), rep)
    assert "RNTI" in str(rep.errors[0])
