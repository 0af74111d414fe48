#!/bin/bash
# Rebuild the reference oatk binaries used as parity oracles by tests/.
#
# Tests hard-code /root/refbin/{oatk,syncasm,pathfinder,path_to_fasta,
# rotate,hmmannot,syncasm_debug,levtest}.  The directory is not part of
# this repo and may be wiped between rounds; re-run this script when
# tests fail with FileNotFoundError on /root/refbin/*.
#
# syncasm_debug = syncasm with DEBUG_SYNCMER_SEQ enabled
# (reference run_syncasm.c:46 has `#undef DEBUG_SYNCMER_SEQ`).
# levtest = levdist.c compiled with -DLEVDIST_TEST_NAIVE.
set -euo pipefail

REF=${1:-/root/reference}
OUT=${2:-/root/refbin}
BUILD=$(mktemp -d /tmp/refbuild.XXXXXX)

cp -r "$REF"/. "$BUILD"/
make -C "$BUILD" -j"$(nproc)" >/dev/null

cd "$BUILD"
sed 's/#undef DEBUG_SYNCMER_SEQ/#define DEBUG_SYNCMER_SEQ/' run_syncasm.c > run_syncasm_dbg.c
gcc -Wall -O2 -Wno-unused-function -DSYNCASM_MAIN run_syncasm_dbg.c syncasm.c \
    syncmer.c syncerr.c levdist.c graph.c alignment.c sstream.c misc.c \
    kalloc.c kopen.c kthread.c -o syncasm_debug -lm -lz -lpthread
gcc -O2 -DLEVDIST_TEST_NAIVE levdist.c -o levtest

mkdir -p "$OUT"
cp oatk syncasm pathfinder path_to_fasta rotate hmmannot syncasm_debug levtest "$OUT"/
rm -rf "$BUILD"
echo "installed reference binaries to $OUT"
