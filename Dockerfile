# Containerized deployment twin of the reference's runnable image
# (/root/reference/Dockerfile:1-11: FROM python -> COPY app -> CMD
# python ./src/loader.py). The Spark-native equivalent layers the thin
# library jar onto the stock Apache Spark image and makes the reference's
# pipeline loop (discovery -> dispatch -> cell guard -> publish) the
# container's command. Built from PUBLIC images only; the jar is produced
# by `sbt package` beforehand (see README "Packaging & deployment") —
# keeping the sbt toolchain out of the runtime image keeps it small and
# mirrors the reference's interpreter-plus-sources shape.
#
# Build:
#   sbt package
#   docker build -t graft .
#
# Run (the reference's loop shape — mount a folder of .sql files and a
# destination for the published sheets):
#   docker run -v /path/sql:/data/sql -v /path/out:/data/out graft \
#     /data/sql /data/out
#
# Any other entry point rides the same image via --class overrides:
#   docker run graft driver ... --class graft.Verify local:///opt/graft/graft.jar <sfDir> <outDir>
#
# On a cluster this image serves as the spark-submit --master k8s://...
# container image unchanged: the jar is at a fixed in-image path and the
# library depends on nothing beyond Spark itself (scalatest is
# test-scoped), so no assembly/shading layer exists to drift.
# match the build's Spark (build.sbt: Spark 4.1.2 on Scala 2.13/Java 17)
FROM apache/spark:4.1.2-scala2.13-java17-ubuntu

# the one artifact: target/scala-2.13/sheetsetlspark_2.13-0.1.0.jar
COPY target/scala-2.13/sheetsetlspark_2.13-*.jar /opt/graft/graft.jar

# cron-driven deployments (the reference's documented usage,
# README.md:38-44 there) override the args; defaults document the shape
ENTRYPOINT ["/opt/spark/bin/spark-submit", \
  "--class", "graft.tools.EtlDemo", \
  "--conf", "spark.sql.extensions=graft.GraftExtensions", \
  "local:///opt/graft/graft.jar"]
CMD ["/data/sql", "/data/out"]
