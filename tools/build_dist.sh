#!/bin/sh
# Build the --py-files artifact for spark-submit.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/jsonschema_rs_spark.zip
python -c "
import zipfile, os
with zipfile.ZipFile('dist/jsonschema_rs_spark.zip', 'w') as z:
    for root, _, files in os.walk('jsonschema_rs_spark'):
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
print('dist/jsonschema_rs_spark.zip written')
"
