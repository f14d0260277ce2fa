#!/usr/bin/env bash
# Package the engine and launch the transcript pipeline via
# spark-submit --py-files, as the deployment contract requires.
#
#   ./submit.sh --input /root/testdata/sf0.01 --output /tmp/out [...]
#
# MASTER defaults to local[32]; on a real cluster set e.g.
#   MASTER=yarn ./submit.sh ...
set -euo pipefail
cd "$(dirname "$0")"

ZIP=/tmp/ilogtail_spark.zip
rm -f "$ZIP"
python -c "
import shutil, zipfile, os
with zipfile.ZipFile('$ZIP', 'w') as z:
    for root, _, files in os.walk('ilogtail_spark'):
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
"

exec spark-submit \
  --master "${MASTER:-local[32]}" \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-32}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --py-files "$ZIP" \
  run_pipeline.py "$@"
