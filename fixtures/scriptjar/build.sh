#!/bin/sh
# Rebuild external-script-job.jar — the fixture for the script_jar
# runtime-load path. Run from the repo root AFTER `sbt compile` (the source
# implements graft.script.ScriptJob, so the engine classes must exist).
# The jar is checked in so Verify/tests don't need a compiler at run time;
# rebuild only if ScriptJob's trait signature changes.
set -eu
CACHE=$(dirname "$(find /root/.cache/coursier -name 'scala-compiler-2.13.17.jar' | head -1)")/../..
LIB=$(find /root/.cache/coursier -name 'scala-library-2.13.17.jar' | head -1)
REFL=$(find /root/.cache/coursier -name 'scala-reflect-2.13.17.jar' | head -1)
COMP=$(find /root/.cache/coursier -name 'scala-compiler-2.13.17.jar' | head -1)
OUT=fixtures/scriptjar/classes
rm -rf "$OUT" && mkdir -p "$OUT"
java -cp "$COMP:$REFL:$LIB" scala.tools.nsc.Main \
  -classpath "$LIB:/opt/spark/jars/*:target/scala-2.13/classes" \
  -d "$OUT" fixtures/scriptjar/src/ExternalScoreJob.scala
jar cf fixtures/scriptjar/external-script-job.jar -C "$OUT" .
rm -rf "$OUT"
echo "built fixtures/scriptjar/external-script-job.jar"
