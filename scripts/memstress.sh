#!/usr/bin/env bash
# Memory-pressure stress harness: runs each heavy query in its OWN small-
# heap JVM (graft.MemStress) against a ScaleCheck-materialized 100x corpus
# and folds the MEMSTRESS result lines into STRESSCHECK.json. A JVM the
# query killed (uncatchable OOM) is recorded as outcome=jvm_dead with the
# exit code — that, not a parsed line, is the honest signal for a real OOM.
#
# Usage: scripts/memstress.sh <corpusDir> <heap e.g. 3g> [q1,q2,...]
set -u
DIR="${1:?corpus dir}"
HEAP="${2:-3g}"
QUERIES="${3:-x_jaccard_join,x_cross_dedup,x_embed_dedup,x_triangles,x_novelty,x_knn_join,x_stream_join_restart,x_stream_dedup_rocksdb,x_video_dedup}"
OUT=STRESSCHECK.json
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
IFS=',' read -ra QS <<< "$QUERIES"
for q in "${QS[@]}"; do
  echo "=== memstress $q @ $HEAP ==="
  SPARK_DRIVER_MEM="$HEAP" sbt -batch "runMain graft.MemStress $DIR $q" \
    > "$TMP/$q.out" 2>&1
  rc=$?
  grep -h '^MEMSTRESS {' "$TMP/$q.out" | tail -1 > "$TMP/$q.line" || true
  if [ ! -s "$TMP/$q.line" ]; then
    echo "{\"query\":\"$q\",\"outcome\":\"jvm_dead\",\"exit\":$rc,\"heap\":\"$HEAP\",\"sf_dir\":\"$DIR\"}" > "$TMP/$q.line"
    tail -5 "$TMP/$q.out"
  fi
  cat "$TMP/$q.line"
done
python3 - "$TMP" "$HEAP" "$DIR" <<'EOF'
import json, sys, glob, os
tmp, heap, d = sys.argv[1], sys.argv[2], sys.argv[3]
path = 'STRESSCHECK.json'
root = {}
if os.path.exists(path):
    with open(path) as f:
        root = json.load(f)
meta = root.setdefault('_meta', {})
meta['protocol'] = ('one query per JVM at SPARK_DRIVER_MEM heap, production '
    'knobs (local[32], shuffle.partitions=32), 100x structure-preserving '
    'corpus; outcome=ok requires a clean end-to-end collect(); spill cells '
    'are summed task memory/diskBytesSpilled; jvm_dead = uncatchable OOM. '
    'Sessions apply graft.plans.MemoryDiscipline: under 512 MiB heap/core '
    'the spill-reader read-ahead is disabled (its unaccounted 2x1MiB '
    'buffers were the observed OOM site at 3g/32 cores)')
meta['corpus_dir'] = d
for p in sorted(glob.glob(f'{tmp}/*.line')):
    with open(p) as f:
        line = f.read().strip().replace('MEMSTRESS ', '')
    if not line:
        continue
    row = json.loads(line)
    q = row.pop('query')
    root.setdefault(q, {})[f'heap_{heap}'] = row
with open(path, 'w') as f:
    json.dump(root, f, indent=2, sort_keys=True)
    f.write('\n')
print(f'wrote {path}')
EOF
