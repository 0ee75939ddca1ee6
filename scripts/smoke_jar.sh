#!/usr/bin/env bash
# Packaged-jar smoke test (round-11, verdict ask #6): proves a consuming
# team can use the library from the PACKAGED jar alone — plain
# spark-shell --jars, no sbt test classpath — by running one dedup call
# (near-dup keeper election, q67), one retrieval call (BM25 ranking,
# q167), and one graph call from the newest surface (star-contraction
# CC, q316 — r15/r16 coverage) against a testdata scale dir, asserting
# all return rows.
#
# Usage: scripts/smoke_jar.sh [sfDir]     (default /root/testdata/sf0.001)
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.001}"

sbt -batch package
JAR="$(ls target/scala-2.13/socialandmediadataingestionspark_2.13-*.jar | head -1)"
echo "jar: $JAR"

SCRIPT="$(mktemp /tmp/graft-smoke-XXXX.scala)"
cat > "$SCRIPT" <<EOF
val dir = "$SF"
// one dedup call: MinHash+LSH -> connected components -> keeper verdict
val keepers = graft.Graft.dedup.nearDupKeepers(spark, dir)
val nKeep = keepers.filter(org.apache.spark.sql.functions.col("is_keeper")).count()
// one retrieval call: BM25 top-k over the documents table
val bm25 = graft.Graft.retrieval.bm25Rank(spark, dir)
val nHits = bm25.count()
// one graph call from the newest surface: large/small-star contraction
// CC over the deep-chain fixture (q316, round 15)
val stars = graft.Graft.graph.starClusters(spark, dir)
val nStars = stars.filter(org.apache.spark.sql.functions.col("cluster_size") > 1).count()
println(s"SMOKE keepers=\$nKeep bm25_rows=\$nHits star_clustered=\$nStars")
assert(nKeep > 0 && nHits > 0 && nStars > 0, "smoke failed: empty result")
println("SMOKE_OK")
EOF

OUT="$(/opt/spark/bin/spark-shell \
  --master 'local[4]' \
  --jars "$JAR" \
  --conf spark.sql.extensions=graft.GraftExtensions \
  --conf spark.sql.shuffle.partitions=4 \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.ui.enabled=false \
  < "$SCRIPT" 2>&1)" || true
rm -f "$SCRIPT"

echo "$OUT" | grep -E "^SMOKE" || true
if echo "$OUT" | grep -q "SMOKE_OK"; then
  echo "packaged-jar smoke: PASS"
else
  echo "packaged-jar smoke: FAIL"
  echo "$OUT" | tail -40
  exit 1
fi
