from .table import Column, ColumnInfo, Table  # noqa: F401
from .schema import SchemaRegistry  # noqa: F401
from .dictionary import DictionaryRegistry, StringDictionary  # noqa: F401
