#!/usr/bin/env bash
# Install the framework plus the script-layer extras, and prebuild the
# native C++ runtime (reference: scripts/install.sh installs the PyPI
# wheel + plotting/eval deps; our native lib is built from source since
# there is no prebuilt wheel matrix yet).
set -euo pipefail
cd "$(dirname "$0")/.."

# --no-build-isolation: setuptools is a baseline dep; this also keeps
# the install working in air-gapped environments.
python -m pip install --no-build-isolation -e .

# Optional extras used by scripts/evaluate.py, plot.py, trainbpe.py,
# convert.py. All are gated with import guards, so failures here only
# disable the corresponding baselines.
python -m pip install tiktoken sentencepiece transformers tokenizers \
    matplotlib datasets || true

# Prebuild the native runtime so the first CLI call doesn't pay the
# compile (tokengeex_tpu/utils/nativelib.py builds lazily otherwise).
python - <<'EOF'
from tokengeex_tpu.utils import nativelib
print("native runtime:", nativelib.build())
EOF
