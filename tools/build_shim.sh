#!/bin/sh
# Build the DSv2 shim jar with the scalac BUNDLED in pyspark's jars —
# no network, no sbt resolution. Output:
#   dazzleduck_sql_duckdb_spark/jars/dd_arrow_shim.jar
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SPARK_JARS="$(python3 -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "jars"))')"
CP="$(ls "$SPARK_JARS"/*.jar | tr '\n' ':')"
OUT="$(mktemp -d)"
java -cp "$CP" scala.tools.nsc.Main \
  -classpath "$CP" -d "$OUT" "$REPO/scala/DdArrowShim.scala"
# short-name lookup (format("dd_arrow_dsv2")) goes through the
# ServiceLoader registry for DataSourceRegister
mkdir -p "$OUT/META-INF/services"
printf 'org.apache.spark.sql.dazzleduck.DdArrowDataSource\n' \
  > "$OUT/META-INF/services/org.apache.spark.sql.sources.DataSourceRegister"
mkdir -p "$REPO/dazzleduck_sql_duckdb_spark/jars"
jar --create --file "$REPO/dazzleduck_sql_duckdb_spark/jars/dd_arrow_shim.jar" \
  -C "$OUT" . 2>/dev/null || (cd "$OUT" && zip -qr "$REPO/dazzleduck_sql_duckdb_spark/jars/dd_arrow_shim.jar" .)
# record the source hash the jar was built from; test_dsv2_shim fails
# on drift between scala/DdArrowShim.scala and the committed binary
sha256sum "$REPO/scala/DdArrowShim.scala" | cut -d' ' -f1 \
  > "$REPO/dazzleduck_sql_duckdb_spark/jars/dd_arrow_shim.jar.src.sha256"
rm -rf "$OUT"
echo "built: $REPO/dazzleduck_sql_duckdb_spark/jars/dd_arrow_shim.jar"
