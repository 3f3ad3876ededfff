#!/bin/sh
# Build the --py-files archive for spark-submit.
set -e
cd "$(dirname "$0")/.."
rm -f taco_toolbox_spark.zip
python -c "
import shutil, zipfile, os
with zipfile.ZipFile('taco_toolbox_spark.zip', 'w') as z:
    for root, _, files in os.walk('taco_toolbox_spark'):
        if '__pycache__' in root: continue
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
print('wrote taco_toolbox_spark.zip')
"
