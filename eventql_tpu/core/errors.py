"""Error types mirroring the reference engine's error surface.

The reference raises typed exceptions (kParseError, kRuntimeError, ...)
whose messages are part of the observable behavior (golden test
00003_test_error_message compares the message text verbatim, see
test/sql_tests.cc and util/exception.h in the reference).
"""


class SQLError(Exception):
    """Base error. `kind` mirrors the reference's error class names."""

    kind = "RuntimeError"

    def __init__(self, message: str):
        super().__init__(message)
        self.message = message


class ParseError(SQLError):
    kind = "ParseError"


class RuntimeError_(SQLError):
    kind = "RuntimeError"


class NotImplementedError_(SQLError):
    kind = "NotImplementedError"


class ProtocolDesyncError(SQLError):
    """Client-side wire desync (unexpected opcode mid-conversation).

    Unlike a server-reported OP_ERROR — which leaves the connection at
    a clean frame boundary — a desync means unread frames may remain on
    the socket, so the connection must NOT be returned to a pool
    (reference closes the connection on unexpected opcodes,
    transport/native/connection_tcp.cc)."""

    kind = "IOError"
