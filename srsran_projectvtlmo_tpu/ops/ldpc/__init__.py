from . import graphs, encode, decode, segment
from . import rate_match as rate_matching
from .graphs import LdpcGraph, get_graph
from .encode import ldpc_encode
from .decode import ldpc_decode
