#!/bin/sh
# commit-msg hook: refuse a commit whose message claims a CLEAN bench
# while the recorded artifact says otherwise. Rounds 14 and 16 both
# shipped close-out commits saying "clean 32-cpu bench" over a
# bench_last.json with "polluted": true; this makes that slip
# impossible instead of relying on discipline.
#
# Install (one-time, also done by scripts/install_hooks.sh):
#   cp scripts/commit_msg_bench_guard.sh .git/hooks/commit-msg && chmod +x .git/hooks/commit-msg
MSG_FILE="$1"
[ -f "$MSG_FILE" ] || exit 0
if grep -iqE 'clean[^.]*bench|bench[^.]*clean' "$MSG_FILE"; then
  if [ -f bench_last.json ] && grep -q '"polluted":true' bench_last.json; then
    echo "REFUSED: commit message claims a clean bench but bench_last.json records \"polluted\": true." >&2
    echo "Re-record on a quiet machine (Bench marks pollution itself) or drop the claim from the message." >&2
    exit 1
  fi
  if [ ! -f bench_last.json ]; then
    echo "REFUSED: commit message claims a clean bench but there is no bench_last.json artifact to back it." >&2
    exit 1
  fi
fi
exit 0
