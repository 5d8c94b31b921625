#!/bin/bash
# Reference-recipe training at corpus scale on the CPU-native backend
# (README.md:155-250 of the reference: generate -> prune -> filter ->
# merge), producing the tokenizer artifact for the compression
# evaluation. Device perf numbers come separately from
# scripts/bench_scale.py on the chip; this run is about the ARTIFACT
# and the host-side wall-clocks.
#
# Usage: train_scale_cpu.sh [corpus_dir] [out_dir] [gen_size] [target]
set -euo pipefail
CORPUS=${1:-/tmp/corpus}
OUT=${2:-/tmp/scale1g}
GEN=${3:-262144}
TARGET=${4:-32768}
cd /root/repo
mkdir -p "$OUT"
export PALLAS_AXON_POOL_IPS=""
export JAX_PLATFORMS=cpu
export PYTHONPATH=/root/repo
TRAINS=()
for f in "$CORPUS"/train/*.bin; do
  [ -s "$f" ] || continue
  TRAINS+=(--train "$(basename "$f" .bin):$f")
done
echo "sources: ${#TRAINS[@]}"

python -m tokengeex_tpu.cli regex -o "$OUT/fine.regex" \
  -p any-char -p space-lowercase-word -p space-uppercase-word \
  -p space-capitalized-word -p english-contraction -p chinese-word \
  -p indent -p space-operator-space -p space-punct-space

SECONDS=0
python -m tokengeex_tpu.cli generate -v "$GEN" -o "$OUT/v-gen.json" \
  --processor crlf --processor nfc --allow data/exact.regex \
  --insert-probability 0.01 --max-token-length 16 "${TRAINS[@]}"
echo "STAGE generate s=$SECONDS"

SECONDS=0
python -m tokengeex_tpu.cli prune -i "$OUT/v-gen.json" -o "$OUT/v-pruned.json" \
  -v "$TARGET" --dropout 0.05 --shrink-factor 0.8 --em-subiters 2 \
  --backend native --checkpoint-every 1 "${TRAINS[@]}"
echo "STAGE prune s=$SECONDS"

SECONDS=0
python -m tokengeex_tpu.cli filter -i "$OUT/v-pruned.json" \
  -o "$OUT/v-filtered.json" -v $((TARGET - 2768)) --min-score -13.0
echo "STAGE filter s=$SECONDS"

SECONDS=0
python -m tokengeex_tpu.cli merge -i "$OUT/v-filtered.json" \
  -o "$OUT/v-final.json" --allow "$OUT/fine.regex" --num-merges 2000 \
  --step 100 --scale-factor 0.9 --max-token-length 20 \
  --backend native "${TRAINS[@]}"
echo "STAGE merge s=$SECONDS"
echo "DONE"
