#!/usr/bin/env bash
# Round-close artifact archival (r11-verdict item 6): the driver's
# BENCH_rN.json / CORRECTNESS_rN.json land in the repo root, but
# round 10's were never committed and vanished with the VM — only the
# BASELINE.md same-VM control rows kept that round judgeable. Run
# this at round close (or any time) to commit whatever artifacts
# exist; it is idempotent and safe to re-run.
set -euo pipefail
cd "$(dirname "$0")/.."
shopt -s nullglob
files=(BENCH_r*.json CORRECTNESS_r*.json VERDICT.md ADVICE.md BASELINE.md)
to_add=()
for f in "${files[@]}"; do
  [ -f "$f" ] && to_add+=("$f")
done
if [ ${#to_add[@]} -eq 0 ]; then
  echo "no artifacts found"; exit 0
fi
git add -- "${to_add[@]}"
if git diff --cached --quiet -- "${to_add[@]}"; then
  echo "artifacts already committed: ${to_add[*]}"
else
  # pathspec'd commit: never sweeps up unrelated staged work
  git commit -m "Archive round artifacts" -- "${to_add[@]}"
  echo "committed: ${to_add[*]}"
fi
