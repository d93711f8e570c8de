"""Thin spark-submit launcher (north rule launch shape).

spark-submit needs an application FILE; the package itself ships via
--py-files (see lasvdedup_spark/packaging.py):

    python -m lasvdedup_spark.packaging --out lasvdedup_spark.zip
    spark-submit --py-files lasvdedup_spark.zip scripts/run_dedup.py \
        --input pages_parquet --output out_dir \
        --config conf.yaml --checkpoint-dir ckpt --tiers minhash,exact
"""

import sys

from lasvdedup_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
