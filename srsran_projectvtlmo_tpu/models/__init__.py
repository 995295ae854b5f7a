from .pdsch_tx import PdschTxConfig, build_pdsch_tx_slot, pdsch_tx_slot
from .pusch_rx import PuschRxConfig, build_pusch_rx_slot, cached_pusch_rx
from .ulsch_tx import build_ulsch_tx_slot, cached_ulsch_tx
from .channel import ChannelEmulator, TDL_PROFILES
