#!/bin/sh
# Package the engine for spark-submit --py-files.
#   tools/make_pyfiles.sh [out.zip]
# Then:
#   spark-submit --py-files gorillaspark.zip \
#       gorillaspark/jobs/rollup_job.py --transcripts ... --warehouse ...
set -e
cd "$(dirname "$0")/.."
OUT="${1:-gorillaspark.zip}"
rm -f "$OUT"
# ship sources only; the optional C kernel rebuilds itself on executors
# (codec/native.py) and falls back to numpy when no compiler exists
zip -qr "$OUT" gorillaspark -i 'gorillaspark/*.py' 'gorillaspark/*/*.py' \
    'gorillaspark/codec/_native/gorilla.c'
echo "$OUT"
