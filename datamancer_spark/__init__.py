"""datamancer_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of SciNim/Datamancer (reference at
/root/reference, studied in SURVEY.md), re-expressed Spark-first:
DataFrame/Catalyst plans, not a port of the reference's eager tensor engine.
"""

from .frame import DamFrame, to_df
from .io import (
    load_tables,
    read_csv,
    read_parquet,
    to_html,
    to_org_table,
    write_csv,
    write_parquet,
)
from .session import get_spark

__all__ = [
    "DamFrame",
    "get_spark",
    "load_tables",
    "read_csv",
    "read_parquet",
    "to_df",
    "to_html",
    "to_org_table",
    "write_csv",
    "write_parquet",
]

__version__ = "0.1.0"
