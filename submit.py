"""spark-submit primary script (north_rule: "launched via spark-submit
--py-files on a multi-executor cluster").

The packaged CLI (easy_solr4files_index_spark/cli.py) uses relative
imports, so it cannot be spark-submit's primary file itself; this thin
dispatcher is. Ship the engine to the driver and every executor with:

    python -m zipfile -c easy_solr4files_index_spark.zip easy_solr4files_index_spark
    spark-submit --master <cluster> --py-files easy_solr4files_index_spark.zip \
        submit.py build --input <docs parquet/iceberg table> --index <dir>
    spark-submit ... submit.py query --index <dir> --text "spark join" --k 10

spark-submit provides the SparkSession (master, executors, dynamic
allocation); the CLI's `_spark` helper only fills in local[] defaults
when no session exists, so the same verbs run unchanged in tests.
Smoke-tested end-to-end in tests/test_cli.py
(test_spark_submit_pyfiles_smoke): zip → spark-submit build → query,
asserting the query envelope carries rows and `found`.
"""
import sys

from easy_solr4files_index_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
