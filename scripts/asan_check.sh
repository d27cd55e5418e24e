#!/bin/sh
# Memory-safety gate for the native runtime (SURVEY §5 sanitizer parity
# with the reference's `make asan=1`): rebuild both C modules with
# AddressSanitizer, run the full pipeline on the C4 fixture and the bench
# corpus, and fail on any ASan error or native-module leak. Leaks from
# CPython interpreter internals are expected and ignored.
set -e
REPO=$(cd "$(dirname "$0")/.." && pwd)
TMP=$(mktemp -d)
cc -O1 -g -fsanitize=address -shared -fPIC \
    "$REPO/pangene_tpu/native/pgsweep.c" -o "$TMP/_pgsweep.so" -lm
if [ -e /usr/include/libdeflate.h ]; then
    PG_DEFL="-DPG_HAVE_LIBDEFLATE -ldeflate"
else
    PG_DEFL=""
fi
cc -O1 -g -fsanitize=address -shared -fPIC \
    "$REPO/pangene_tpu/native/pgparse.c" -o "$TMP/_pgparse.so" \
    $PG_DEFL -lz -lm
cp "$REPO/pangene_tpu/native/_pgsweep.so" "$TMP/save_sweep.so" 2>/dev/null || true
cp "$REPO/pangene_tpu/native/_pgparse.so" "$TMP/save_parse.so" 2>/dev/null || true
cp "$TMP/_pgsweep.so" "$REPO/pangene_tpu/native/_pgsweep.so"
cp "$TMP/_pgparse.so" "$REPO/pangene_tpu/native/_pgparse.so"
touch "$REPO/pangene_tpu/native/_pgsweep.so" "$REPO/pangene_tpu/native/_pgparse.so"
trap 'cp "$TMP/save_sweep.so" "$REPO/pangene_tpu/native/_pgsweep.so" 2>/dev/null;
      cp "$TMP/save_parse.so" "$REPO/pangene_tpu/native/_pgparse.so" 2>/dev/null;
      touch "$REPO/pangene_tpu/native/"*.so; rm -rf "$TMP"' EXIT
LD_PRELOAD=$(cc -print-file-name=libasan.so) ASAN_OPTIONS=detect_leaks=1 \
    PYTHONPATH="$REPO:$PYTHONPATH" \
    python3 -m pangene_tpu.cli /root/reference/test/C4/*.paf.gz \
    > /dev/null 2> "$TMP/err.txt" || true
if grep -q "ERROR: AddressSanitizer" "$TMP/err.txt"; then
    echo "ASAN FAILURE:"; grep -A20 "ERROR: AddressSanitizer" "$TMP/err.txt"
    exit 1
fi
if grep -q "pgsweep\|pgparse" "$TMP/err.txt"; then
    echo "NATIVE LEAK:"; grep -B2 -A10 "pgsweep\|pgparse" "$TMP/err.txt"
    exit 1
fi
echo "asan_check: clean"
