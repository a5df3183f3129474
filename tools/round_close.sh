#!/bin/sh
# Round-close checklist (VERDICT r4 item 5: stale evidence citations kept
# recurring — make the final doc pass mechanical).
#
# Usage: sh tools/round_close.sh 5
set -e
R=${1:?usage: round_close.sh N   (current round number)}
cd "$(dirname "$0")/.."

echo "== 1. stale artifact citations in README.md (should cite r0$R) =="
if grep -n "_r0[0-9]" README.md | grep -v "_r0$R"; then
    echo "   ^^ stale citations above — update to the r0$R artifacts"
else
    echo "   clean"
fi

echo "== 2. current-round artifacts present =="
for f in "QUALITY_r0$R.json" "PROFILE_r0$R.json" "SCALING_r0$R.json"; do
    [ -f "$f" ] && echo "   ok   $f" || echo "   MISSING $f"
done

echo "== 3. prewarm seed =="
python tools/prewarm.py --check || echo "   ^^ run: python tools/prewarm.py --regen && git add .jax_prewarm"

echo "== 4. reminders (manual) =="
echo "   - PERF.md headline table has an r$R row with the measured number"
echo "   - bench.py runs clean end-to-end (the driver will run it)"
echo "   - tests green: python -m pytest tests/ -x -q"
echo "   - memory notes updated (~/.claude auto-memory)"
