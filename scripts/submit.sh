#!/usr/bin/env bash
# Package the engine and run it via spark-submit --py-files (north_rule
# shipping requirement). On a real cluster replace --master local[32]
# with your YARN/K8s master and size executors/shuffle partitions to
# ~2-3x total cores.
set -euo pipefail
cd "$(dirname "$0")/.."

rm -f /tmp/louvain_fast_move_cuda_spark.zip
zip -qr /tmp/louvain_fast_move_cuda_spark.zip louvain_fast_move_cuda_spark

exec spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-32}]" \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_CPUS:-32}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --py-files /tmp/louvain_fast_move_cuda_spark.zip \
  "$@"
