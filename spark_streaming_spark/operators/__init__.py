"""Operator library: pure DataFrame -> DataFrame functions.

Each module covers one SURVEY.md §2 family; every public operator has a
``queries()`` + ``oracle_sql()`` registration in ``__spark_entry__.py``.
"""
