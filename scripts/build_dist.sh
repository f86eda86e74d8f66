#!/bin/sh
# Build the --py-files zip for spark-submit (SURVEY.md §7 M7 packaging).
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/finddup_spark.zip
python -c "
import zipfile, os
with zipfile.ZipFile('dist/finddup_spark.zip', 'w', zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk('finddup_spark'):
        if '__pycache__' in root:
            continue
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
print('dist/finddup_spark.zip written')
"
