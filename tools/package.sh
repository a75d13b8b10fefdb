#!/usr/bin/env bash
# Build the runnable daemon distribution under dist/: the thin
# application jar plus the graft-downloader launcher. This is the same
# composition the Dockerfile performs in its runtime stage; run it
# directly on any machine with a Spark 4.x jar directory.
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch package
mkdir -p dist
cp target/scala-2.13/downloaderspark_2.13-*.jar dist/graft.jar
cp tools/graft-downloader dist/graft-downloader
chmod +x dist/graft-downloader
echo "dist/ ready:"
ls -l dist/
echo
echo "run: dist/graft-downloader <storeRootUri> <manifestUrl>"
