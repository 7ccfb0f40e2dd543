"""spark-submit primary file for the KG pipeline.

    ZIP=$(python -c "import sys; sys.path.insert(0,'.'); \
from recon_spark.deploy import build_pyfiles_zip; print(build_pyfiles_zip())")
    spark-submit --py-files "$ZIP" scripts/run_pipeline.py \
        --pages /data/crawl/pages --out /data/kg/triples --parts 1024

The package arrives on driver and executors via --py-files; no repo
checkout is needed on the cluster.
"""
import sys

from recon_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main())
