#!/bin/bash
# Builds the reference-vector dumper against the read-only reference mount.
# The resulting binary drives the srsRAN generic LDPC encoder/decoder so the
# TPU rebuild can be cross-validated bit-for-bit (tools/ref_crossval/generate.py).
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/refbuild}
mkdir -p "$OUT"
INC="-I$REF/include -I$REF/lib/phy/upper/channel_coding/ldpc -I$REF/external/fmt/include -DFMT_HEADER_ONLY"
cd "$OUT"
for f in \
  $REF/lib/phy/upper/channel_coding/ldpc/ldpc_encoder_generic.cpp \
  $REF/lib/phy/upper/channel_coding/ldpc/ldpc_encoder_impl.cpp \
  $REF/lib/phy/upper/channel_coding/ldpc/ldpc_decoder_generic.cpp \
  $REF/lib/phy/upper/channel_coding/ldpc/ldpc_decoder_impl.cpp \
  $REF/lib/phy/upper/channel_coding/ldpc/ldpc_graph_impl.cpp \
  $REF/lib/phy/upper/channel_coding/ldpc/ldpc_luts_impl.cpp \
  $REF/lib/phy/upper/log_likelihood_ratio.cpp \
  $REF/lib/srsvec/bit.cpp $REF/lib/srsvec/dot_prod.cpp $REF/lib/srsvec/compare.cpp; do
  g++ -O2 -std=c++17 $INC -c "$f" -o "$(basename "$f" .cpp).o"
done
g++ -O2 -std=c++17 $INC -c "$(dirname "$0")/dump_vectors.cpp" -o dump.o
g++ -o dump ./*.o
echo "built $OUT/dump"
