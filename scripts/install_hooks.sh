#!/bin/sh
# Install the repo's git hooks (idempotent).
cd "$(git rev-parse --show-toplevel)" || exit 1
cp scripts/commit_msg_bench_guard.sh .git/hooks/commit-msg
chmod +x .git/hooks/commit-msg
echo "installed commit-msg bench guard"
