"""Device-resident compressed array: the TPU-native cvector mode.

Where container.CompressedArray keeps compressed chunks in HOST memory (the
drop-in cvector equivalent), this container keeps them in HBM: data lives as
compressed frame records plus the decode index the encode kernel emits
(ops/encode_pallas.encode_slabs_index), and slabs decompress on demand with
the Pallas decode kernel — no host byte traffic in either direction. This is
the cvector analog for device-scale working sets (checkpoint shards,
cold activations, archived KV blocks): memory_footprint is the compressed
HBM bytes, access is slab-granular.

Interop: serialize() emits a standard stenos frame (custom-blocksize header,
stenos.h:159-168) decodable by the C++ reference; deserialize() adopts a
frame via the batched host parser. Mirrors cvector's serialize contract
(cvector.hpp:3034-3193) at slab granularity.

Cost model: the random-access index is ONE int32 per 256-byte plane
(offset | plane-code<<24) = 1.6% of the uncompressed size; the decode
kernel derives the row records from the stream's own header bytes in VMEM
(decode_pallas derive mode), so no rowtab sidecar exists in HBM.
"""

import numpy as np

import jax
import jax.numpy as jnp


def _interp() -> bool:
    # Pallas kernels compile only on TPU; CPU (tests) uses interpret mode
    return jax.default_backend() != "tpu"


class DeviceCompressedArray:
    """Immutable-shape device-resident compressed array of a fixed dtype.

    Build with from_array / deserialize; read via slab(i), __getitem__
    (element/slice, decodes the covering slabs), or to_array().
    """

    def __init__(self, dtype, slab_bytes: int, nbytes: int, rows, totals,
                 plane_off, tail: bytes, plane_order: str = "jb"):
        self.dtype = np.dtype(dtype)
        self.slab_bytes = slab_bytes
        self.nbytes = nbytes
        self._rows = rows            # (n_slabs, rb) uint8, device
        self._totals = totals        # (n_slabs,) int32, host numpy
        self._plane_off = plane_off  # (n_slabs, P) i32, off | code<<24
        # plane ordering of _plane_off: 'jb' (encoder-native) or 'bj'
        # (host-parser/stream order, adoption path)
        self._order = plane_order
        self._tail = tail            # bytes beyond the last full slab
        # original compressed records (host bytes), kept when adopting an
        # external frame whose virtual stream differs from its record bytes
        # (LZ/COPY blocks inlined by the parser); serialize() prefers these
        self._records = None

    # ---------------------------------------------------------- construct
    @classmethod
    def from_array(cls, arr, slab_elems: int | None = None,
                   block_level: int = 2):
        """arr: 1-D numpy/jax array of a fixed-size dtype. slab_elems
        defaults to 128 KiB worth of elements (the reference superblock)."""
        from .engine_jax import _bucket125
        from .ops.encode_pallas import encode_slabs_index_jit, slab_nb

        a = np.asarray(arr)
        dtype = a.dtype
        bpp = dtype.itemsize
        # nb must be a power of two <= 128 so serialize()'s custom-shift
        # frame header (slab = block << shift) is exactly representable;
        # wide elements get smaller slabs (kernel VMEM scales with bpp*nb)
        cap = min(128, max(8, 1024 // bpp))
        nb = 1
        while nb * 2 <= cap:
            nb *= 2
        if slab_elems is not None:
            nb = 1
            while nb * 2 <= min(slab_elems // 256, cap):
                nb *= 2
        slab_elems = nb * 256
        if slab_nb(nb) != nb:
            raise ValueError(f"slab of {nb} blocks exceeds the kernel gate")
        slab_bytes = slab_elems * bpp
        raw = a.view(np.uint8).reshape(-1)
        nbytes = len(raw)
        n_slabs = nbytes // slab_bytes
        tail = raw[n_slabs * slab_bytes :].tobytes()
        if n_slabs == 0:
            return cls(dtype, slab_bytes, nbytes, None, np.zeros(0, np.int32),
                       None, tail)
        batch = raw[: n_slabs * slab_bytes].reshape(n_slabs, slab_bytes)
        rows, totals, _, _, po = encode_slabs_index_jit(
            jnp.asarray(batch), bpp, block_level, _interp())
        totals = np.asarray(totals)
        rb = min(_bucket125(int(totals.max()) + 512), rows.shape[1])
        rows = jnp.asarray(rows[:, :rb])  # drop padding beyond the bucket
        return cls(dtype, slab_bytes, nbytes, rows, totals, po, tail, "jb")

    @classmethod
    def deserialize(cls, frame: bytes, dtype):
        """Adopt a standard stenos frame (any producer, incl. the C++
        reference) without decompressing: host parses the decode index, the
        payloads go to HBM. Non-BLOCK methods fall back via frame.decompress
        then re-compress."""
        from . import frame as fr
        from .engine_jax import _bucket125
        from .native import lib as native

        dtype = np.dtype(dtype)
        bpp = dtype.itemsize
        dsize, sb, pos = fr.get_info(frame, bpp)
        ok = native is not None and sb % (256 * bpp) == 0
        offs, csizes = [], []
        p = pos
        n_full = dsize // sb
        if ok:
            for _ in range(n_full):
                if p + 4 > len(frame) or frame[p] != 1:
                    ok = False
                    break
                c = int.from_bytes(frame[p + 1 : p + 4], "little")
                offs.append(p + 4)
                csizes.append(c)
                p += 4 + c
        if not ok or n_full == 0:
            data = fr.decompress(frame, bpp)
            return cls.from_array(np.frombuffer(bytes(data), dtype))
        row_bytes = _bucket125(max(csizes) + 512)
        r = native.parse_rows_batch(frame, bpp, sb, offs, csizes, row_bytes)
        if isinstance(r, int):
            data = fr.decompress(frame, bpp)
            return cls.from_array(np.frombuffer(bytes(data), dtype))
        vbufs, plane_off, _rowtab, vlens = r
        row_bytes = vbufs.shape[1]  # may have grown on the LZ-retry path
        tail = b""
        if dsize > n_full * sb:  # short last superblock: decode on host
            tail = bytes(fr.decompress(frame, bpp)[n_full * sb :])
        # note: parsed offsets are payload-relative; the kernel contract is
        # record-relative (4-byte header included) — prepend headers.
        # rows hold the VIRTUAL stream (length vlens[i], >= csize when LZ
        # blocks were inlined); the original records are kept separately so
        # serialize() re-emits the adopted frame bytes verbatim.
        # width stays a multiple of 128 (decode kernel reshapes to 128-lanes)
        rows = np.zeros((n_full, -(-(row_bytes + 4) // 128) * 128), np.uint8)
        totals = np.zeros(n_full, np.int32)
        records = []
        for i in range(n_full):
            v = int(vlens[i])
            rows[i, :4] = np.frombuffer(
                frame[offs[i] - 4 : offs[i]], np.uint8)
            rows[i, 4 : 4 + v] = vbufs[i, :v]
            totals[i] = v + 4
            records.append(frame[offs[i] - 4 : offs[i] + csizes[i]])
        self = cls(dtype, sb, dsize, jnp.asarray(rows), totals,
                   jnp.asarray(plane_off + 4), tail, "bj")
        self._records = records
        return self

    # ------------------------------------------------------------- access
    @property
    def n_slabs(self) -> int:
        return 0 if self._rows is None else self._rows.shape[0]

    def __len__(self) -> int:
        return self.nbytes // self.dtype.itemsize

    def slab(self, i: int):
        """Decode slab i -> (slab_bytes,) uint8 jax array, device-resident
        (bitcast to the element dtype on device as needed)."""
        words = self._decode_range(i, i + 1)
        b4 = jax.lax.bitcast_convert_type(words, jnp.uint8)
        return b4.reshape(-1)

    def _decode_range(self, s0: int, s1: int):
        from .ops.decode_pallas import decode_slabs_derive_jit

        nb = self.slab_bytes // (256 * self.dtype.itemsize)
        return decode_slabs_derive_jit(
            self._rows[s0:s1], self._plane_off[s0:s1],
            self.dtype.itemsize, nb, self._order, _interp())

    def to_array(self) -> np.ndarray:
        out = np.empty(self.nbytes, np.uint8)
        if self.n_slabs:
            words = self._decode_range(0, self.n_slabs)
            body = np.ascontiguousarray(np.asarray(words)).view(np.uint8)
            out[: self.n_slabs * self.slab_bytes] = body.reshape(-1)
        if self._tail:
            out[self.nbytes - len(self._tail) :] = np.frombuffer(
                self._tail, np.uint8)
        return out.view(self.dtype)

    def __getitem__(self, idx):
        esize = self.dtype.itemsize
        n = len(self)
        if isinstance(idx, int):
            if idx < 0:
                idx += n
            b = idx * esize
            s = b // self.slab_bytes
            if s >= self.n_slabs:
                off = b - self.n_slabs * self.slab_bytes
                return np.frombuffer(self._tail, self.dtype,
                                     count=1, offset=off)[0]
            words = self._decode_range(s, s + 1)
            body = np.ascontiguousarray(np.asarray(words)).view(np.uint8)
            off = b - s * self.slab_bytes
            return np.frombuffer(body.reshape(-1)[off : off + esize].tobytes(),
                                 self.dtype)[0]
        if isinstance(idx, slice):
            start, stop, step = idx.indices(n)
            return self.to_array()[start:stop:step]
        raise TypeError(idx)

    # ------------------------------------------------------------ metrics
    def memory_footprint(self) -> int:
        """Compressed HBM bytes + index (the cvector memory_footprint
        analog, cvector.hpp:1886-1895)."""
        if self._rows is None:
            return len(self._tail)
        return (int(self._rows.shape[0]) * int(self._rows.shape[1])
                + self._plane_off.size * 4 + len(self._tail))

    def current_compression_ratio(self) -> float:
        return self.nbytes / max(self.memory_footprint(), 1)

    # ------------------------------------------------------ serialization
    def serialize(self) -> bytes:
        """Standard stenos frame (custom-blocksize header) — decodable by
        stenos_decompress and by frame.decompress."""
        from . import frame as fr

        out = bytearray()
        out += bytes([255]) + self.nbytes.to_bytes(7, "little")
        out += self.slab_bytes.to_bytes(4, "little")
        if self._records is not None:
            for rec in self._records:
                out += rec
        elif self.n_slabs:
            rows = np.asarray(self._rows)
            for i in range(self.n_slabs):
                out += bytes(rows[i][: self._totals[i]])
        if self._tail:
            blob = fr.compress(np.frombuffer(self._tail, np.uint8),
                               self.dtype.itemsize, 1,
                               custom_shift=_shift_of(self.slab_bytes,
                                                      self.dtype.itemsize))
            out += blob[12:]  # strip its header, keep superblock records
        return bytes(out)


def _shift_of(slab_bytes: int, bpp: int) -> int:
    block = 256 * bpp
    shift = 0
    while (block << shift) < slab_bytes:
        shift += 1
    return shift
