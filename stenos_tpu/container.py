"""CompressedArray — the cvector equivalent (reference: stenos/cvector.hpp).

A chunked, transparently-compressed array: data lives as independently
compressed buckets of 256<<block_shift elements; a bounded pool of
decompressed buckets (with dirty tracking) serves reads/writes, mirroring
the reference's CompressedVectorInternal context stealing
(cvector.hpp:1340-1927) with Python/numpy-shaped APIs (slicing and bulk
`apply` instead of C++ reference wrappers).

Serialization is byte-compatible with cvector::serialize: a custom-blocksize
stenos frame (shift=255 header, stenos.cpp:829-842) whose payload is
decompressible by plain stenos_decompress — verified against the C++
reference in tests/test_container.py.
"""

import numpy as np

from . import frame as _frame
from .constants import compress_bound


class _Bucket:
    __slots__ = ("compressed", "raw", "dirty")

    def __init__(self):
        self.compressed = None  # bytes: 4B superblock header + payload
        self.raw = None  # np array of elements (decompressed)
        self.dirty = False


class CompressedArray:
    """A compressed, append-able 1-D array of fixed-size elements."""

    def __init__(self, dtype, block_shift: int = 0, level: int = 1,
                 engine=None, max_raw_buckets: int | None = None):
        self.dtype = np.dtype(dtype)
        if self.dtype.hasobject:
            raise TypeError("CompressedArray requires a fixed-size dtype")
        self.block_shift = block_shift
        self.level = level
        self.engine = engine
        self.chunk_elems = 256 << block_shift
        self.chunk_bytes = self.chunk_elems * self.dtype.itemsize
        self._buckets: list[_Bucket] = []
        self._size = 0  # total elements
        self._max_raw = max_raw_buckets
        self._raw_count = 0

    # ------------------------------------------------------------- internals
    def _bpp(self) -> int:
        return self.dtype.itemsize

    def _compress_chunk(self, raw_bytes: np.ndarray) -> bytes:
        return _frame.compress_superblock(
            raw_bytes, self._bpp(), self.level,
            compress_bound(len(raw_bytes)) + 16, self.engine)

    def _decompress_chunk(self, blob: bytes, nbytes: int) -> np.ndarray:
        code = blob[0]
        return _frame.decompress_superblock(
            code, np.frombuffer(blob, np.uint8)[4:], self._bpp(), nbytes,
            self.engine)

    def _bucket_len(self, i: int) -> int:
        if i < len(self._buckets) - 1:
            return self.chunk_elems
        return self._size - i * self.chunk_elems

    def _raw(self, i: int) -> np.ndarray:
        """Decompress bucket i into its raw cache (stealing if over limit)."""
        b = self._buckets[i]
        if b.raw is None:
            nbytes = self._bucket_len(i) * self.dtype.itemsize
            data = self._decompress_chunk(b.compressed, nbytes)
            b.raw = np.frombuffer(data.tobytes(), self.dtype).copy()
            self._raw_count += 1
            self._evict(keep=i)
        return b.raw

    def _evict(self, keep: int):
        limit = self._max_raw or max(2, len(self._buckets) // 16 + 1)
        if self._raw_count <= limit:
            return
        for j, b in enumerate(self._buckets[:-1]):  # keep the back bucket hot
            if j != keep and b.raw is not None:
                self._pack(j)
                if self._raw_count <= limit:
                    return

    def _pack(self, i: int):
        b = self._buckets[i]
        if b.raw is None:
            return
        if b.dirty or b.compressed is None:
            raw_bytes = np.frombuffer(b.raw.tobytes(), np.uint8)
            b.compressed = self._compress_chunk(raw_bytes)
            b.dirty = False
        b.raw = None
        self._raw_count -= 1

    # ------------------------------------------------------------- basic API
    def __len__(self) -> int:
        return self._size

    def append(self, value):
        i = self._size // self.chunk_elems
        if i == len(self._buckets):
            nb = _Bucket()
            nb.raw = np.empty(self.chunk_elems, self.dtype)
            self._buckets.append(nb)
            self._raw_count += 1
            self._evict(keep=i)
        b = self._buckets[i]
        if b.raw is None:
            self._raw(i)
            b = self._buckets[i]
            if len(b.raw) < self.chunk_elems:
                full = np.empty(self.chunk_elems, self.dtype)
                full[: len(b.raw)] = b.raw
                b.raw = full
        b.raw[self._size % self.chunk_elems] = value
        b.dirty = True
        self._size += 1

    def extend(self, values):
        values = np.asarray(values, self.dtype)
        pos = 0
        while pos < len(values):
            i = self._size // self.chunk_elems
            off = self._size % self.chunk_elems
            if i == len(self._buckets):
                nb = _Bucket()
                nb.raw = np.empty(self.chunk_elems, self.dtype)
                self._buckets.append(nb)
                self._raw_count += 1
                self._evict(keep=i)
            b = self._buckets[i]
            if b.raw is None:
                self._raw(i)
                b = self._buckets[i]
                if len(b.raw) < self.chunk_elems:
                    full = np.empty(self.chunk_elems, self.dtype)
                    full[: len(b.raw)] = b.raw
                    b.raw = full
            take = min(self.chunk_elems - off, len(values) - pos)
            b.raw[off : off + take] = values[pos : pos + take]
            b.dirty = True
            self._size += take
            pos += take

    def __getitem__(self, idx):
        if isinstance(idx, slice):
            start, stop, step = idx.indices(self._size)
            out = np.empty(max(0, -(-(stop - start) // step)) if step > 0
                           else max(0, -(-(start - stop) // -step)),
                           self.dtype)
            # bulk path over touched buckets
            r = np.arange(start, stop, step)
            for i in np.unique(r // self.chunk_elems):
                sel = (r // self.chunk_elems) == i
                local = r[sel] - i * self.chunk_elems
                out[np.nonzero(sel)[0]] = self._raw(int(i))[local]
            return out
        idx = int(idx)
        if idx < 0:
            idx += self._size
        if not 0 <= idx < self._size:
            raise IndexError(idx)
        return self._raw(idx // self.chunk_elems)[idx % self.chunk_elems]

    def __setitem__(self, idx, value):
        if isinstance(idx, slice):
            start, stop, step = idx.indices(self._size)
            r = np.arange(start, stop, step)
            value = np.broadcast_to(np.asarray(value, self.dtype), r.shape)
            for i in np.unique(r // self.chunk_elems):
                sel = (r // self.chunk_elems) == i
                local = r[sel] - i * self.chunk_elems
                raw = self._raw(int(i))
                raw[local] = value[np.nonzero(sel)[0]]
                self._buckets[int(i)].dirty = True
            return
        idx = int(idx)
        if idx < 0:
            idx += self._size
        if not 0 <= idx < self._size:
            raise IndexError(idx)
        i = idx // self.chunk_elems
        self._raw(i)[idx % self.chunk_elems] = value
        self._buckets[i].dirty = True

    def __iter__(self):
        for i in range(len(self._buckets)):
            raw = self._raw(i)[: self._bucket_len(i)]
            yield from raw

    # ------------------------------------------------------- bulk operations
    def apply(self, fn, start: int = 0, stop: int | None = None):
        """for_each equivalent: run fn(chunk_view) over decompressed chunks
        in [start, stop); fn may mutate the view (marks the bucket dirty).
        Returns the number of elements visited (early stop: fn returns
        False)."""
        stop = self._size if stop is None else min(stop, self._size)
        visited = 0
        pos = start
        while pos < stop:
            i = pos // self.chunk_elems
            off = pos % self.chunk_elems
            end = min(stop - i * self.chunk_elems, self._bucket_len(i))
            view = self._raw(i)[off:end]
            r = fn(view)
            self._buckets[i].dirty = True
            visited += len(view)
            if r is False:
                break
            pos = (i + 1) * self.chunk_elems
        return visited

    def to_numpy(self) -> np.ndarray:
        out = np.empty(self._size, self.dtype)
        pos = 0
        for i in range(len(self._buckets)):
            n = self._bucket_len(i)
            out[pos : pos + n] = self._raw(i)[:n]
            pos += n
        return out

    # ------------------------------------------------------------- metrics
    def memory_footprint(self) -> int:
        total = 0
        for b in self._buckets:
            if b.compressed is not None:
                total += len(b.compressed)
            if b.raw is not None:
                total += b.raw.nbytes
        return total

    def current_compression_ratio(self) -> float:
        fp = self.memory_footprint()
        return (self._size * self.dtype.itemsize) / fp if fp else 0.0

    def compression_ratio(self) -> float:
        comp = sum(len(b.compressed) for b in self._buckets
                   if b.compressed is not None)
        full = sum(self.chunk_bytes for b in self._buckets
                   if b.compressed is not None)
        return full / comp if comp else 0.0

    # --------------------------------------------------------- serialization
    def serialize(self) -> bytes:
        """cvector::serialize-compatible frame (decompressible by plain
        stenos_decompress / stenos_tpu.decompress)."""
        nbytes = self._size * self.dtype.itemsize
        header = bytes([255]) + nbytes.to_bytes(7, "little") + \
            self.chunk_bytes.to_bytes(4, "little")
        parts = [header]
        for i, b in enumerate(self._buckets):
            n = self._bucket_len(i) * self.dtype.itemsize
            if b.dirty or b.compressed is None or (
                    i == len(self._buckets) - 1 and n < self.chunk_bytes):
                raw = self._raw(i)[: self._bucket_len(i)]
                parts.append(self._compress_chunk(
                    np.frombuffer(raw.tobytes(), np.uint8)))
            else:
                parts.append(b.compressed)
        return b"".join(parts)

    @classmethod
    def deserialize(cls, blob: bytes, dtype, level: int = 1, engine=None):
        """Adopt compressed buckets without decompressing (tail excepted) —
        cvector.hpp:3134-3187 semantics."""
        dtype = np.dtype(dtype)
        dsize, sb, hlen = _frame.get_info(blob, dtype.itemsize)
        if sb % (256 * dtype.itemsize):
            raise ValueError("superblock size not a chunk multiple")
        shift = (sb // (256 * dtype.itemsize)).bit_length() - 1
        out = cls(dtype, block_shift=shift, level=level, engine=engine)
        out._size = dsize // dtype.itemsize
        pos = hlen
        nbuckets = -(-dsize // sb) if dsize else 0
        for i in range(nbuckets):
            csize = int.from_bytes(blob[pos + 1 : pos + 4], "little")
            b = _Bucket()
            b.compressed = bytes(blob[pos : pos + 4 + csize])
            out._buckets.append(b)
            pos += 4 + csize
        return out
