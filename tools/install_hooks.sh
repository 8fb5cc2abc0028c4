#!/bin/sh
# Install repo git hooks (currently just pre-commit count sync).
set -e
cd "$(git rev-parse --show-toplevel)"
cp tools/pre-commit .git/hooks/pre-commit
chmod +x .git/hooks/pre-commit
echo "installed .git/hooks/pre-commit"
