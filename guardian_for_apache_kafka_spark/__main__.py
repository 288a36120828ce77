"""Module entry point: ``python -m guardian_for_apache_kafka_spark <verb> ...``
(equivalent to invoking ``cli.main``; see cli.py for the verb surface)."""

import sys

from guardian_for_apache_kafka_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
