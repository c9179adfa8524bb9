from .writers import append_table, console_display, summary_record, write_csv

__all__ = ["append_table", "console_display", "summary_record", "write_csv"]
