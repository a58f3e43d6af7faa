from . import groupby, joins, setops, temporal

__all__ = ["groupby", "joins", "setops", "temporal"]
