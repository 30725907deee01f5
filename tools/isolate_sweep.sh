#!/bin/bash
# Fresh-JVM isolated timing of selected queries at two SF dirs — the
# SWEEP triage protocol (one Verify pass per query per fresh JVM; the
# ~5 s JVM/parquet-footer warm-up rides every number identically).
# Usage: isolate_sweep.sh <out.log> <sfA> <sfB|-> <q1,q2,...>
set -u
OUT="$1"; SFA="$2"; SFB="$3"; QS="$4"
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
for Q in ${QS//,/ }; do
  for SF in "$SFA" "$SFB"; do
    [ "$SF" = "-" ] && continue
    D=$(mktemp -d /tmp/iso-XXXX)
    T0=$(date +%s.%N)
    # PIPESTATUS: the java exit code, not grep's — a crashed isolate must
    # be distinguishable from a fast one in the triage log (rc= below)
    SPARK_GRAFT_CPUS=32 java $JOPTS -Xmx24g \
      -Dspark.sql.session.timeZone=UTC -Dspark.ui.enabled=false \
      -cp "$CP" graft.Verify "$SF" "$D" "$Q" 2>&1 \
      | grep -E "\[verify\] $Q" >> "$OUT"
    RC=${PIPESTATUS[0]}
    T1=$(date +%s.%N)
    ROWS=$(python3 - "$D/$Q" <<'EOF'
import sys, glob
try:
    import pyarrow.parquet as pq
    print(sum(pq.ParquetFile(f).metadata.num_rows
              for f in glob.glob(sys.argv[1] + "/*.parquet")))
except Exception:
    print(-1)
EOF
)
    WALL=$(awk -v a="$T0" -v b="$T1" 'BEGIN{printf "%.1f", b-a}')
    echo "ISO $Q $SF wall=$WALL rows=$ROWS rc=$RC" >> "$OUT"
    rm -rf "$D"
  done
done
echo "DONE" >> "$OUT"
