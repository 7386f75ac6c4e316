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


# API-compat aliases for the rest of the reference exception surface
# (reference: aiotcvectordb/exceptions.py:20-46) so user code written
# against the reference client's `except` clauses keeps working. The
# connection-flavored ones never fire in embedded mode — there is no
# server to lose — but an `except NoConnectError` must still parse.


class VectorDBException(VectorDBError):
    """Reference's catch-all base alias."""


class ServerInternalError(VectorDBError):
    """Unexpected engine-side failure (reference server code family)."""


class DescribeCollectionException(VectorDBError):
    """describe_collection returned an unusable payload."""


class NoConnectError(VectorDBError):
    """Not connected (embedded mode: never raised; kept for API parity)."""


class ConnectError(VectorDBError):
    """Connection failed (embedded mode: never raised; kept for API parity)."""


class GrpcException(VectorDBError):
    """Transport error (embedded mode: never raised; kept for API parity)."""
