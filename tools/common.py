"""Shared helpers for the driver-side tools: register each fixture
parquet as a DuckDB view named after the table."""
import glob, os

def register_views(con, sfdir):
    for p in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(p)[: -len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
