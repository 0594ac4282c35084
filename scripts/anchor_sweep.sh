#!/bin/bash
# Round-12 clean-window bench anchor (VERDICT r11 item 4).
# Protocol: steal-gate (15 s /proc/stat window, steal<0.5% AND sys<10%),
# then interleave fresh-JVM graft.Bench (sf0.1, cpus=32) with
# scripts/duck_bench.py, recording /proc/stat deltas DURING each run.
set -u
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | paste -sd:)"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
OUT=/tmp/anchor_r14
mkdir -p "$OUT"

cpu_snap() { head -1 /proc/stat; }
# args: "before" "after" -> prints "steal_pct sys_pct"
cpu_delta() {
  python3 - "$1" "$2" <<'EOF'
import sys
b = list(map(int, sys.argv[1].split()[1:]))
a = list(map(int, sys.argv[2].split()[1:]))
d = [x-y for x,y in zip(a,b)]
tot = sum(d) or 1
print(f"{100*d[7]/tot:.3f} {100*d[2]/tot:.3f}")
EOF
}

gate() {
  for i in 1 2 3 4 5 6 7 8; do
    B=$(cpu_snap); sleep 15; A=$(cpu_snap)
    read ST SY <<<"$(cpu_delta "$B" "$A")"
    echo "[gate] window $i: steal=$ST% sys=$SY%"
    ok=$(python3 -c "print(1 if $ST<0.5 and $SY<10 else 0)")
    [ "$ok" = 1 ] && return 0
  done
  echo "[gate] NO CLEAN WINDOW after 8 tries"; return 1
}

run_spark() {
  n=$1
  B=$(cpu_snap)
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    java -Xmx96g $OPENS -Dspark.ui.enabled=false \
    -cp "$CP" graft.Bench > "$OUT/spark_run$n.json" 2>"$OUT/spark_run$n.log"
  A=$(cpu_snap)
  read ST SY <<<"$(cpu_delta "$B" "$A")"
  echo "[spark run $n] steal=$ST% sys=$SY% total=$(python3 -c "import json;print(json.load(open('$OUT/spark_run$n.json'))['value'])" 2>/dev/null || echo PARSE_FAIL)"
}

run_duck() {
  n=$1
  B=$(cpu_snap)
  python3 /root/repo/scripts/duck_bench.py /root/testdata/sf0.1 /tmp/oracle_sql.json \
    > "$OUT/duck_run$n.json" 2>"$OUT/duck_run$n.log"
  A=$(cpu_snap)
  read ST SY <<<"$(cpu_delta "$B" "$A")"
  echo "[duck run $n] steal=$ST% sys=$SY% total=$(python3 -c "import json;d=json.load(open('$OUT/duck_run$n.json'));print(d.get('total', d.get('value')))" 2>/dev/null || echo PARSE_FAIL)"
}

echo "=== anchor sweep $(date -u +%FT%TZ) ==="
# in-storm fallback (r13 convention): if no clean window opens, run
# anyway — per-run steal is recorded and min-of-3 interleaved is the
# estimator of record
gate || echo "[gate] proceeding IN-STORM (min-of-3 interleaved fallback)"
for n in 1 2 3; do
  run_spark $n
  run_duck $n
done
echo "=== done $(date -u +%FT%TZ) ==="
