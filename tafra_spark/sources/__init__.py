from . import csv, http, sql, warc

__all__ = ["csv", "http", "sql", "warc"]
