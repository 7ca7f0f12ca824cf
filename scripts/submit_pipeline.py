"""spark-submit entry shim for the pipeline CLI (north-rule run mode).

The package module uses relative imports, so spark-submit gets this
absolute-import shim instead:

    python -c "import glob, os, zipfile, easyner_spark as p; \\
        d = os.path.dirname(p.__file__); \\
        z = zipfile.ZipFile('/tmp/easyner_spark_pyfiles.zip', 'w'); \\
        [z.write(f, os.path.relpath(f, os.path.dirname(d))) \\
         for f in glob.glob(d + '/**/*.py', recursive=True)]"
    spark-submit --master local-cluster[2,2,2048] \\
        --py-files /tmp/easyner_spark_pyfiles.zip \\
        scripts/submit_pipeline.py --warehouse /tmp/wh --n-docs 2000

easyner_spark.session.get_spark detects the submit-provided master and
does not override it, so the same command works against any cluster
manager (standalone / YARN / k8s).
"""

from easyner_spark.pipeline import main

if __name__ == "__main__":
    main()
