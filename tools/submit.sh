#!/usr/bin/env bash
# spark-submit entry (north rule: "runs via spark-submit --py-files on
# multi-executor clusters"). In-sandbox this runs local[N]; on a real
# cluster set MASTER and add --packages for an Iceberg catalog.
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=/tmp/georasters_spark_pkg.zip
rm -f "$ZIP"
zip -qr "$ZIP" georasters_spark

MASTER="${MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"
exec spark-submit \
  --master "$MASTER" \
  --driver-memory "${SPARK_DRIVER_MEM:-48g}" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  "${@:-bench.py}"
