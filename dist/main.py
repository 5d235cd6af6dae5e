"""spark-submit driver shim: ships with --py-files ccl_spark.zip."""
from ccl_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
