#!/bin/bash
# Reference-recipe training at corpus scale on the DEVICE (TPU) backend
# (reference README.md:155-250: generate -> prune -> filter -> merge).
# Same stages/parameters as train_scale_cpu.sh but with prune/merge on
# the chip (DeviceTrainSession / DeviceCorpus); generate stays on the
# host-native DFA counter (the measured-default split, BASELINE.md
# round 3 "generate-feed device vs native").
#
# Usage: train_scale_device.sh [corpus_dir] [out_dir] [gen_size] [target]
set -euo pipefail
CORPUS=${1:-/tmp/corpus}
OUT=${2:-/tmp/scale1g_tpu}
GEN=${3:-262144}
TARGET=${4:-32768}
cd /root/repo
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
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
if [ ! -s "$OUT/v-gen.json" ]; then
python -m tokengeex_tpu.cli generate -v "$GEN" -o "$OUT/v-gen.json" \
  --processor crlf --processor nfc --allow data/exact.regex \
  --insert-probability 0.01 --max-token-length 16 "${TRAINS[@]}"
fi
echo "STAGE generate s=$SECONDS"

# em-subiters 1 is the reference CLI default (src/cli.rs:699); the
# committed recipes use 2 (docs/RECIPES.md) — 1 halves device EM wall-
# clock at this corpus size. The Viterbi frequency + merge count passes
# route to the threaded C++ counters via their measured-crossover auto
# gates (train/prune.py _count_frequencies, train/merge.py _count_pairs).
SECONDS=0
python -m tokengeex_tpu.cli prune -i "$OUT/v-gen.json" -o "$OUT/v-pruned.json" \
  -v "$TARGET" --dropout 0.05 --shrink-factor 0.8 --em-subiters "${EM_SUBITERS:-1}" \
  --backend device --checkpoint-every 1 "${TRAINS[@]}"
echo "STAGE prune s=$SECONDS"

SECONDS=0
python -m tokengeex_tpu.cli filter -i "$OUT/v-pruned.json" \
  -o "$OUT/v-filtered.json" -v $((TARGET - 2768)) --min-score -13.0
echo "STAGE filter s=$SECONDS"

SECONDS=0
python -m tokengeex_tpu.cli merge -i "$OUT/v-filtered.json" \
  -o "$OUT/v-final.json" --allow "$OUT/fine.regex" --num-merges 2000 \
  --step 100 --scale-factor 0.9 --max-token-length 20 \
  --backend auto "${TRAINS[@]}"
echo "STAGE merge s=$SECONDS"
echo "DONE"
