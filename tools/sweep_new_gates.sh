#!/bin/bash
# Standing per-round sweep of the round's NEW gates (VERDICT r14 ask 7):
# diff the current registry against the previous round's CORRECTNESS
# file, isolate-sweep the additions at sf0.1 and the sf1.0 replica(s)
# via isolate_sweep.sh (fresh JVM per query per SF, rc-tagged), and
# print the SWEEP-ready markdown table on stdout.
#
# Usage: sweep_new_gates.sh <prev_CORRECTNESS.json> <sfA> <sfB|-> [out.log]
# Run from the repo root after `sbt compile`.
set -u
PREV="$1"; SFA="$2"; SFB="$3"; OUT="${4:-/tmp/sweep_new_gates.log}"

NEW=$(python3 - "$PREV" <<'EOF'
import json, re, sys
prev = set(json.load(open(sys.argv[1])).keys())
src = open("src/main/scala/graft/Queries.scala").read()
# registry entries: "qNNN_name" -> qNNN (the `all` map's closed format)
cur = set(re.findall(r'"(q\d+_[a-z0-9_]+)" -> q\d+', src))
new = sorted(cur - prev)
print(",".join(new))
EOF
)
if [ -z "$NEW" ]; then
  echo "no new gates vs $PREV"
  exit 0
fi
echo "new gates: $NEW" >&2
: > "$OUT"
bash "$(dirname "$0")/isolate_sweep.sh" "$OUT" "$SFA" "$SFB" "$NEW"

python3 - "$OUT" "$SFA" "$SFB" <<'EOF'
import sys, re, collections
log, sfa, sfb = sys.argv[1], sys.argv[2], sys.argv[3]
rows = collections.defaultdict(dict)
for line in open(log):
    m = re.match(r"ISO (\S+) (\S+) wall=(\S+) rows=(-?\d+)(?: rc=(\d+))?", line)
    if m:
        q, sf, wall, nrows, rc = m.groups()
        rows[q][sf] = (float(wall), int(nrows), rc or "?")
print("| query | %s s | %s s | ratio | rows A→B | rc |" % (sfa, sfb))
print("|---|---|---|---|---|---|")
for q, d in sorted(rows.items()):
    a = d.get(sfa)
    b = d.get(sfb)
    if a and b:
        ratio = "%.1f×" % (b[0] / a[0]) if a[0] > 0 else "—"
        print("| %s | %.1f | %.1f | %s | %d → %d | %s/%s |"
              % (q, a[0], b[0], ratio, a[1], b[1], a[2], b[2]))
    elif a:
        print("| %s | %.1f | — | — | %d → — | %s/— |" % (q, a[0], a[1], a[2]))
EOF
