"""Sources & sinks: catalog abstraction (Iceberg-or-parquet) and the
EGRN-extract XML ingest that builds the parcel layer."""
