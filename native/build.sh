#!/bin/bash
# Build the native runtime accelerators as a shared library.
set -euo pipefail
cd "$(dirname "$0")"
gcc -O3 -fPIC -shared -o librtnative.so rtnative.c -lm
echo "built $(pwd)/librtnative.so"
