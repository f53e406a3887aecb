"""Root-only logging and result-file writing.

Replaces the reference's Message class (message.h:65-83): a root-only
``<<`` stream tee'd to stdout and ``<outfile>.log``, plus
constructed-on-filename result writers with optional gzip (--zout,
message.h:32-35).  In single-controller JAX, "root" is process_index 0.
"""

from __future__ import annotations

import gzip
import io
import sys
from typing import Optional

import jax


def is_root() -> bool:
    return jax.process_index() == 0


class Message:
    """A root-only writer.

    ``Message()``                — log to stdout (+ attached .log file).
    ``Message(path)``            — result-file writer (parity with the
                                   reference's `Message(filename)` result
                                   files, message.h:51-52).
    ``Message(path, gz=True)``   — gzip-compressed output (--zout parity).
    """

    def __init__(self, path: Optional[str] = None, gz: bool = False, tee_stdout: bool = False):
        self._root = is_root()
        self._gz = gz
        self._tee = tee_stdout or path is None
        self._fh = None
        self.path = None
        if self._root and path is not None:
            self.path = path + ".gz" if gz else path
            self._fh = gzip.open(self.path, "wt") if gz else open(self.path, "w")

    def write(self, text: str) -> "Message":
        if not self._root:
            return self
        if self._tee:
            sys.stdout.write(text)
        if self._fh is not None:
            self._fh.write(text)
        return self

    def __call__(self, *parts) -> "Message":
        return self.write(" ".join(str(p) for p in parts) + "\n")

    def flush(self):
        if self._fh is not None:
            self._fh.flush()
        if self._tee:
            sys.stdout.flush()

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class Logger:
    """The global log: stdout + optional <outfile>.log tee (misc.changeOutputs)."""

    def __init__(self):
        self._logfile: Optional[io.TextIOBase] = None
        self.verbose = False

    def attach_file(self, out_prefix: str):
        if is_root():
            self._logfile = open(out_prefix + ".log", "w")

    def message(self, *parts):
        if not is_root():
            return
        line = " ".join(str(p) for p in parts)
        sys.stdout.write(line + "\n")
        if self._logfile is not None:
            self._logfile.write(line + "\n")
            self._logfile.flush()

    def debug(self, *parts):
        if self.verbose:
            self.message(*parts)

    def close(self):
        if self._logfile is not None:
            self._logfile.close()
            self._logfile = None


_LOGGER = Logger()


def get_logger() -> Logger:
    return _LOGGER


class DissectError(RuntimeError):
    """Replaces misc.error -> MPI_Abort (misc.cpp:151) with an exception."""


def error(msg: str):
    raise DissectError(msg)


# --- gzip result-file toggle (--zout, message.h:32-35) ----------------------

_ZOUT = False


def set_zout(flag: bool):
    global _ZOUT
    _ZOUT = bool(flag)


def result_open(path: str, mode: str = "w"):
    """Open a result file, gzip-compressed (path + '.gz') when --zout is
    active — the Message(filename) + boost::iostreams analog."""
    if _ZOUT:
        return gzip.open(path + ".gz", mode + "t")
    return open(path, mode)
