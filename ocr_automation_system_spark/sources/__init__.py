from .catalog import TABLE_NAMES, load_table, load_tables, write_results
