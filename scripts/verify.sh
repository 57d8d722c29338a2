#!/bin/sh
# Repo verification: full test suite + driver entry points + bench smoke.
set -e
cd "$(dirname "$0")/.."
echo "== unit + integration tests (virtual 8-CPU mesh) =="
python -m pytest tests/ -q
echo "== driver entry points =="
python - <<'PY'
import __graft_entry__ as g
g.dryrun_multichip(8)
print("dryrun_multichip(8) OK")
PY
echo "== bench smoke (CPU, small) =="
python bench.py --cpu --frames 50 --iters 2
echo "verify: ALL OK"
