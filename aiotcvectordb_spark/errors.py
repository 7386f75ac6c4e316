"""Engine exceptions.

Mirrors the error surface of the reference client
(reference: aiotcvectordb/exceptions.py:1-58 — ParamError,
ServerInternalError with (code, message)) without copying its code.
"""

from __future__ import annotations


class VectorDBError(Exception):
    """Base error; carries an integer code like the reference wire protocol."""

    def __init__(self, message: str, code: int = -1) -> None:
        super().__init__(message)
        self.code = code
        self.message = message


class ParamError(VectorDBError):
    """Invalid argument (reference code 14100 for unknown database)."""

    def __init__(self, message: str, code: int = 14100) -> None:
        super().__init__(message, code)


class CollectionNotExistError(VectorDBError):
    """Reference server code 15302: collection does not exist."""

    def __init__(self, message: str) -> None:
        super().__init__(message, 15302)


class DatabaseNotExistError(VectorDBError):
    def __init__(self, message: str) -> None:
        super().__init__(message, 14100)
