from . import groupby, joins, setops

__all__ = ["groupby", "joins", "setops"]
