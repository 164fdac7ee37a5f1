from .tables import load_table, load_tables, register_views  # noqa: F401
from .export_json import read_dynamodb_export  # noqa: F401
from .cdc_envelope import read_cdc_records, read_cdc_record_stream  # noqa: F401
