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
g++ -o dump dump.o ldpc_encoder_generic.o ldpc_encoder_impl.o ldpc_decoder_generic.o \
  ldpc_decoder_impl.o ldpc_graph_impl.o ldpc_luts_impl.o log_likelihood_ratio.o \
  bit.o dot_prod.o compare.o
echo "built $OUT/dump"

# UL-SCH demultiplexer + ulsch_info cross-validation dumper.
UINC="$INC -I$REF/lib/phy/upper/channel_processors/pusch"
for f in \
  $REF/lib/phy/upper/channel_processors/pusch/ulsch_demultiplex_impl.cpp \
  $REF/lib/ran/pusch/ulsch_info.cpp \
  $REF/lib/ran/sch/sch_segmentation.cpp; do
  g++ -O2 -std=c++17 $UINC -c "$f" -o "$(basename "$f" .cpp).o"
done
g++ -O2 -std=c++17 $UINC -c "$(dirname "$0")/dump_ulsch.cpp" -o dump_ulsch.o
g++ -o dump_ulsch dump_ulsch.o ulsch_demultiplex_impl.o ulsch_info.o \
  sch_segmentation.o log_likelihood_ratio.o bit.o compare.o
echo "built $OUT/dump_ulsch"
