#!/usr/bin/env bash
# Batch-evaluate every vocabulary in hub/vocab/v2 against the test set
# (mirrors reference scripts/evaluate.sh).
set -euo pipefail

for vocab in hub/vocab/v2/*.json; do
    name=$(basename "$vocab" .json)
    echo "== $name"
    python scripts/evaluate.py -l tokengeex -f "$vocab" \
        -i 'hub/data/test/*.bin' -o "hub/logs/${name}.json"
done
