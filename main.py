"""spark-submit application entry (north_rule: "runs via spark-submit
--py-files on multi-executor clusters").

spark-submit takes an application FILE, not a module (there is no `-m`):

  zip -r colbert_spark.zip colbert_spark
  spark-submit --py-files colbert_spark.zip main.py index \
      --input /path/web_pages --output /path/index
  spark-submit --py-files colbert_spark.zip main.py query \
      --index /path/index --questions q.txt --k 10

Locally the same subcommands run as `python -m colbert_spark ...`.
"""

import sys

from colbert_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main())
