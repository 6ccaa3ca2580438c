"""datamancer_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of SciNim/Datamancer (reference at
/root/reference, studied in SURVEY.md), re-expressed Spark-first:
DataFrame/Catalyst plans, not a port of the reference's eager tensor engine.
"""

from .frame import (
    DamFrame,
    add_row,
    col_max,
    col_min,
    evaluate,
    frames_equal,
    groups_iter,
    reduce_formula,
    to_df,
)
from .io import (
    load_tables,
    parse_csv_string,
    read_csv,
    read_jsonl,
    read_orc,
    read_parquet,
    read_xml,
    show_browser,
    str_tab_to_df,
    to_html,
    to_org_table,
    val_tab_to_df,
    write_csv,
    write_jsonl,
    write_orc,
    write_parquet,
    write_xml,
)
from .session import get_spark, materialize, set_checkpoint_dir

__all__ = [
    "DamFrame",
    "add_row",
    "col_max",
    "col_min",
    "evaluate",
    "frames_equal",
    "get_spark",
    "materialize",
    "set_checkpoint_dir",
    "groups_iter",
    "load_tables",
    "parse_csv_string",
    "read_csv",
    "read_jsonl",
    "read_orc",
    "read_xml",
    "read_parquet",
    "reduce_formula",
    "show_browser",
    "str_tab_to_df",
    "to_df",
    "val_tab_to_df",
    "to_html",
    "to_org_table",
    "write_csv",
    "write_jsonl",
    "write_orc",
    "write_parquet",
    "write_xml",
]

__version__ = "0.1.0"
