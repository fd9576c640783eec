#!/bin/bash
# Canonical LoC accounting (ADVICE r3: the round-3 figure was not
# re-derivable because the exact command was never recorded).  Three views:
#   framework  - the shipped package + integrations (no tests, no tools)
#   tools      - benchmarks/experiments/runbooks
#   tests      - the pytest suite
cd "$(dirname "$0")/.."
count() { find "$@" -name '*.py' -not -path '*__pycache__*' | xargs wc -l | tail -1 | awk '{print $1}'; }
echo "framework (gswm/ comfyui_gswm/ scripts/ bench.py __graft_entry__.py): $(count gswm comfyui_gswm scripts bench.py __graft_entry__.py)"
echo "tools: $(count tools)"
echo "tests: $(count tests)"
