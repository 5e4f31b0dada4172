"""SharePoint/xlsx extract (SURVEY §2.1 S9).

The reference downloads via GraphAPI and converts a sheet to CSV,
dropping all-None rows (sharepoint/sharepoint.py:87-128). The xlsx
parse needs openpyxl, which is not in this container — the Spark-side
plumbing (pandas → createDataFrame → na.drop('all')) is real; the
decode step is gated behind the import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def xlsx_to_df(spark: SparkSession, path: str, sheet: str | int = 0) -> DataFrame:
    """Sheet → DataFrame with the reference's all-null-row drop."""
    import pandas as pd

    try:
        pdf = pd.read_excel(path, sheet_name=sheet)
    except ImportError as e:  # openpyxl missing in this environment
        raise NotImplementedError(
            "xlsx parsing requires openpyxl; install it or convert the "
            "sheet to CSV upstream (reference: sharepoint.py:109-126)"
        ) from e
    pdf.columns = [str(c).lower() for c in pdf.columns]
    return spark.createDataFrame(pdf).na.drop("all")


def csv_passthrough(spark: SparkSession, path: str) -> DataFrame:
    """SharePoint .csv passthrough branch (sharepoint.py:95-101)."""
    from .csv_io import read_csv

    return read_csv(spark, path)
