"""Write-ahead log — the engine-level analog of the reference's WAL
serialization target.

The reference has two persistence targets: checkpoint blocks and the
DuckDB WAL (BoundIndex::GetStorageInfo(to_wal),
/root/reference/src/hnsw/hnsw_index.cpp:534-554), with WAL replay
exercised by test/sql/hnsw/hnsw_insert_wal.test. DuckDB's WAL carries
logical row operations; the reference piggybacks whole-index images on
it. Here the engine owns its WAL directly: an append-only log of logical
DML/DDL records (insert/delete/create_table/create_index/...) written by
`Database` mutations, truncated at checkpoint, and replayed by
`open_database` for operations newer than the last checkpoint. Replaying
logical records rebuilds index maintenance through the normal code path,
so indexes come back consistent even when the process died between
checkpoints (the failure mode hnsw_insert_wal.test:3-21 documents as
broken upstream).

Frame format (little-endian): [u32 magic 'DVTW' | u32 payload_len |
u32 crc32(payload)] + payload (pickled dict of plain values / numpy
arrays). Replay stops at the first short or corrupt frame — a torn tail
from a crash mid-append loses only the interrupted record, matching
standard WAL semantics.
"""

from __future__ import annotations

import os
import pickle
import struct
import zlib
from typing import Iterator

MAGIC = 0x44565457  # 'DVTW'
_HDR = struct.Struct("<III")  # magic, payload_len, crc32(payload)


class WriteAheadLog:
    """Append-only framed record log with CRC-checked replay."""

    def __init__(self, path: str, fsync: bool = False):
        self.path = path
        self.fsync = fsync
        self._f = None

    def _file(self):
        if self._f is None:
            self._f = open(self.path, "ab")
        return self._f

    def append(self, record: dict) -> None:
        payload = pickle.dumps(record, protocol=5)
        f = self._file()
        f.write(_HDR.pack(MAGIC, len(payload), zlib.crc32(payload)))
        f.write(payload)
        f.flush()
        if self.fsync:
            os.fsync(f.fileno())

    def replay(self) -> Iterator[dict]:
        """Yield intact records in append order; stop at a torn tail."""
        self.close()  # release the append handle before reading
        if not os.path.exists(self.path):
            return
        with open(self.path, "rb") as f:
            while True:
                hdr = f.read(_HDR.size)
                if len(hdr) < _HDR.size:
                    return
                magic, ln, crc = _HDR.unpack(hdr)
                if magic != MAGIC:
                    return
                payload = f.read(ln)
                if len(payload) < ln or zlib.crc32(payload) != crc:
                    return
                yield pickle.loads(payload)

    def truncate(self) -> None:
        """Drop all records (called after a successful checkpoint)."""
        self.close()
        with open(self.path, "wb"):
            pass

    def close(self) -> None:
        if self._f is not None:
            self._f.close()
            self._f = None
