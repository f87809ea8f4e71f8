#!/bin/bash
# Interleaved A/B bench: r12 tree vs r13 tree on the drifted query set
# (r13 verdict task #2). Alternates full bench invocations A,B,A,B,...
# on the same box so box-condition drift hits both trees equally; each
# invocation is Bench's own median-of-3 warm reps. Output: per-round
# JSON files /tmp/ab_{r12,r13}_round{N}.json + a summary table.
set -euo pipefail
QS=q_fuzzy_contamination,q_semantic_dedup,q_ktruss,q_power_iteration,q_golden_record,q_bpe_encode,q_incremental_cc,q_hits,q_modularity,q_temperature_mix,q_text_quality,q_session_window,q_dunn,q_rake,q_krippendorff,q_tcloseness
ROUNDS=${1:-3}
for i in $(seq 1 "$ROUNDS"); do
  for tree in r12 r13; do
    echo "== round $i tree $tree =="
    (cd /root/repo/ab_$tree && \
      SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_ONLY=$QS SPARK_GRAFT_BENCH_OUT=/tmp/ab_${tree}_round${i}.json \
      sbt -batch "runMain graft.Bench" > /tmp/ab_${tree}_round${i}.log 2>&1)
  done
done
python3 - "$ROUNDS" <<'PYEOF'
import json, sys, statistics
rounds = int(sys.argv[1])
data = {}
for tree in ("r12", "r13"):
    per = {}
    for i in range(1, rounds + 1):
        d = json.load(open(f"/tmp/ab_{tree}_round{i}.json"))
        for q, s in d.get("queries", d).items():
            per.setdefault(q, []).append(s)
    data[tree] = per
qs = sorted(data["r12"])
print(f"{'query':26s} {'r12 med':>8s} {'r13 med':>8s} {'ratio':>6s}  r12 runs / r13 runs")
tot12 = tot13 = 0.0
for q in qs:
    a = statistics.median(data['r12'][q]); b = statistics.median(data['r13'][q])
    tot12 += a; tot13 += b
    ra = ",".join(f"{x:.2f}" for x in data['r12'][q])
    rb = ",".join(f"{x:.2f}" for x in data['r13'][q])
    print(f"{q:26s} {a:8.2f} {b:8.2f} {b/a:6.2f}  [{ra}] / [{rb}]")
print(f"{'TOTAL':26s} {tot12:8.2f} {tot13:8.2f} {tot13/tot12:6.2f}")
PYEOF
