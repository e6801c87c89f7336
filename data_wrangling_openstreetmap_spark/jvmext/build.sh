#!/bin/sh
# Rebuild dwos-sql-ext.jar against the pyspark-bundled Spark jars.
# Requires only a JDK (javac/jar) -- no Scala compiler: the extension
# implements the Java-visible surface (AbstractFunction1/2,
# ParserInterface) directly.
set -e
cd "$(dirname "$0")"
JARS="$(python3 -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "jars"))')"
rm -rf classes && mkdir -p classes
javac -cp "$JARS/*" -d classes src/dwos/ext/*.java
jar cf dwos-sql-ext.jar -C classes .
rm -rf classes
echo "built $(pwd)/dwos-sql-ext.jar"
