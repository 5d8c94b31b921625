#!/bin/bash
# Compression evaluation of a trained tokenizer vs a same-corpus HF BPE
# baseline on the held-out test split (reference metric:
# scripts/evaluate.py chars/token per language + frequency buckets).
#
# Usage: eval_scale.sh [vocab.json] [bpe.json] [corpus_dir] [out_dir]
set -euo pipefail
VOCAB=${1:-/tmp/scale1g/v-final.json}
BPE=${2:-/tmp/scale1g/bpe32k.json}
CORPUS=${3:-/tmp/corpus}
OUT=${4:-/root/repo/data/eval}
cd /root/repo
mkdir -p "$OUT"
export PALLAS_AXON_POOL_IPS=""
export JAX_PLATFORMS=cpu
export PYTHONPATH=/root/repo
# Fail fast on the tiktoken/HF download rows when offline instead of
# burning minutes in urllib retries.
export HF_HUB_OFFLINE=${HF_HUB_OFFLINE:-1}

python scripts/evaluate.py -l tokengeex -f "$VOCAB" \
  -i "$CORPUS/test/*.bin" -o "$OUT/tokengeex.json"
python scripts/evaluate.py -l tokenizers -f "$BPE" \
  -i "$CORPUS/test/*.bin" -o "$OUT/hf-bpe.json"

python scripts/plot.py -i "$OUT/tokengeex.json" \
  --cpt "$OUT/tokengeex-cpt.png" --freq "$OUT/tokengeex-freq.png" || true
python scripts/plot.py -i "$OUT/hf-bpe.json" \
  --cpt "$OUT/hf-bpe-cpt.png" --freq "$OUT/hf-bpe-freq.png" || true

# Host encode throughput on the held-out python split (tiktoken/HF rows
# print as skipped offline; the TokenGeeX rows are the measurement).
python scripts/benchmark.py 1 "$VOCAB" "$CORPUS/test/python.bin" \
  | tee "$OUT/throughput-1t.txt" || true
python scripts/benchmark.py 4 "$VOCAB" "$CORPUS/test/python.bin" \
  | tee "$OUT/throughput-4t.txt" || true

python - "$OUT" <<'EOF'
import json, sys
out = sys.argv[1]
rows = {}
for name in ("tokengeex", "hf-bpe"):
    d = json.load(open(f"{out}/{name}.json"))
    comp = d["compression"]
    nt = sum(v["num_tokens"] for v in comp.values())
    nc = sum(v["num_chars"] for v in comp.values())
    rows[name] = (d["vocab_size"], nc / max(nt, 1), comp)
langs = sorted(next(iter(rows.values()))[2],
               key=lambda k: -rows["tokengeex"][2][k]["num_chars"])
print("| language | " + " | ".join(rows) + " |")
print("|---|" + "---|" * len(rows))
for lang in langs:
    cells = " | ".join(f"{rows[n][2][lang]['chars_per_token']:.2f}"
                       for n in rows)
    print(f"| {lang} | {cells} |")
cells = " | ".join(f"**{rows[n][1]:.3f}**" for n in rows)
print(f"| **corpus avg** | {cells} |")
for n, (vs, avg, _) in rows.items():
    print(f"{n}: vocab_size={vs} corpus chars/token={avg:.4f}")
EOF
