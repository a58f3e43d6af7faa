from . import csv, sql

__all__ = ["csv", "sql"]
