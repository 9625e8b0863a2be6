"""Fused dense-scan device program: MXU bit-sliced ntHash + Bloom probe.

This is THE TPU formulation of the editor's detection scan (the probe of
every draft k-mer window, reference: subprojects/ntedit/ntedit.cpp:1414-1486,
one rolling probe per position).  Two insights make it MXU-shaped:

1.  **The rolling hash is a 1-D convolution over GF(2).**  ntHash's window
    hash is an XOR of per-position rotated seeds,

        fh(w) = XOR_{j=0..k-1} srol^{k-1-j}( seed(s[w+j]) )
        rh(w) = XOR_{j=0..k-1} srol^{j}( rcseed(s[w+j]) )

    (see ops/nthash.py for the derivation from the reference recurrences,
    reference: subprojects/ntedit/lib/nthash.hpp:100-131).  Each output BIT
    of fh/rh is therefore the parity of a {0,1}-count that is exactly a
    conv1d between a one-hot encoding of the sequence and a constant kernel
    of seed bits: counts are <= k <= 64, integers that small are exact in
    bfloat16, so the whole 64-bit hash of every window rides the MXU as one
    `lax.conv` with kernel [k, 12, 128] (12 input channels = 4 forward base
    classes + 8 reverse-complement classes (c&7); 128 outputs = 64 fh bits
    || 64 rh bits), followed by a parity (&1) and a bit-recombination.
    Measured on a v5e chip this replaces the u64 prefix-XOR ladder
    (ops/nthash_jax.py) at ~2.5x the throughput.

2.  **The Bloom probe picks its engine by filter size.**  Filters that fit
    the one-hot budget (bits <= 2^23, i.e. <= 1 MiB — the reference's
    per-batch filters are 512 KiB, src/goldpolish_targeted_bfs.cpp:271)
    probe via the int8 MXU one-hot lookup (ops/bloom_pallas.py), ~2x the
    XLA gather; larger filters fall back to the XLA gather which is
    size-independent (~25 M win/s measured).

The whole program — one-hot encode, conv hash, extra hashes, probe,
bit-pack — compiles to ONE device computation, so a (possibly tunneled)
chip pays one dispatch per scan chunk.  Output presence bits are packed
8-per-byte for the d2h transfer.

Exactness: the conv formulation is bit-exact for the FULL byte alphabet
(lowercase, IUPAC, N, arbitrary bytes) because the 12 input channels carry
exactly the information the seed tables read: the forward seed is nonzero
only for [ACGTacgt] (4 classes + zero class) and the reverse-complement
seed is seedTab[c & 7] (8 classes).  Pinned against the scalar oracle in
tests/test_scan_conv.py.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from . import nthash as nt

MXU_PROBE_MAX_BITS = 1 << 23  # 1 MiB filter: one-hot probe beats the gather


@functools.lru_cache(maxsize=8)
def _conv_weights(k: int) -> np.ndarray:
    """Constant conv kernel [k, 12, 128] of rotated-seed bits (float32).

    Channels 0..3: forward classes A,C,G,T (case-folded); channels 4..11:
    reverse-complement classes c & 7.  Output lanes 0..63 = fh bits,
    64..127 = rh bits.
    """
    w = np.zeros((k, 12, 128), np.float32)
    fwd = [nt.SEED_A, nt.SEED_C, nt.SEED_G, nt.SEED_T]
    bit = np.arange(64, dtype=np.uint64)
    for j in range(k):
        for c in range(4):
            v = np.uint64(nt.srol_n(np.uint64(fwd[c]), k - 1 - j))
            w[j, c, :64] = ((v >> bit) & np.uint64(1)).astype(np.float32)
        for cc in range(8):
            v = np.uint64(nt.srol_n(nt.SEED_TAB[cc], j))
            w[j, 4 + cc, 64:] = ((v >> bit) & np.uint64(1)).astype(np.float32)
    return w


_POW16 = (1 << np.arange(16, dtype=np.int64)).astype(np.float32)


def _onehot12_from_classes(clsf: jnp.ndarray, clsr: jnp.ndarray) -> jnp.ndarray:
    """forward class (0..3 ACGT, 4 other) + rc class (c & 7) -> [..., 12]."""
    oh_f = (clsf[..., None] == jnp.arange(4, dtype=jnp.int32)).astype(jnp.bfloat16)
    oh_r = (clsr[..., None] == jnp.arange(8, dtype=jnp.int32)).astype(jnp.bfloat16)
    return jnp.concatenate([oh_f, oh_r], axis=-1)


def _onehot12(codes: jnp.ndarray) -> jnp.ndarray:
    """uint8 codes [..., L] -> one-hot [..., L, 12] bf16 (see _conv_weights)."""
    lo = codes | jnp.uint8(32)  # case fold; non-letters stay non-acgt
    clsf = jnp.full(codes.shape, 4, jnp.int32)
    for i, ch in enumerate(b"acgt"):
        clsf = jnp.where(lo == ch, i, clsf)
    clsr = (codes & jnp.uint8(7)).astype(jnp.int32)
    return _onehot12_from_classes(clsf, clsr)


# rc class (c & 7) of the four packed ACGT classes: 'A'&7, 'C'&7, 'G'&7, 'T'&7
_RC_OF_CLASS = np.array([1, 3, 7, 4], np.int32)


def _classes_from_packed(packed: jnp.ndarray, L: int, exc_idx, exc_byte):
    """2-bit packed [B, ceil(L/4)] (+ sparse exceptions) -> (clsf, clsr).

    Exception entries carry the RAW byte of any non-ACGT position (their
    forward class becomes 4/"other" and their rc class the byte's c&7 —
    exactly what the seed tables read); padding entries use idx >= L and
    are dropped by the scatter."""
    b_dim = packed.shape[0]
    shifts = jnp.arange(4, dtype=jnp.uint8) * 2
    cls = ((packed[..., None] >> shifts) & jnp.uint8(3)).astype(jnp.int32)
    cls = cls.reshape(b_dim, -1)[:, :L]
    clsf = cls
    # rc class of ACGT = [1, 3, 7, 4]: selects, NOT a table gather (an
    # 8M-element gather costs more than the transfer the packing saves)
    clsr = jnp.where(
        cls == 0, 1, jnp.where(cls == 1, 3, jnp.where(cls == 2, 7, 4))
    )
    if exc_idx is not None and exc_idx.shape[-1]:
        rows = jnp.broadcast_to(
            jnp.arange(b_dim, dtype=jnp.int32)[:, None], exc_idx.shape
        ).reshape(-1)
        flat_idx = rows * L + jnp.minimum(
            exc_idx.astype(jnp.int32), L
        ).reshape(-1)
        oob = (exc_idx >= L).reshape(-1)
        flat_idx = jnp.where(oob, b_dim * L, flat_idx)
        clsf = clsf.reshape(-1).at[flat_idx].set(4, mode="drop").reshape(b_dim, L)
        rc = (exc_byte & jnp.uint8(7)).astype(jnp.int32).reshape(-1)
        clsr = clsr.reshape(-1).at[flat_idx].set(rc, mode="drop").reshape(b_dim, L)
    return clsf, clsr


def _bits_to_u64(bits: jnp.ndarray) -> jnp.ndarray:
    """[..., 64] {0,1} int32 -> uint64, via four exact 16-bit f32 dots."""
    g = bits.astype(jnp.float32).reshape(*bits.shape[:-1], 4, 16)
    vals = jnp.einsum("...gk,k->...g", g, jnp.asarray(_POW16)).astype(jnp.uint32)
    lo = vals[..., 0] | (vals[..., 1] << jnp.uint32(16))
    hi = vals[..., 2] | (vals[..., 3] << jnp.uint32(16))
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))


def _strand_hashes_from_onehot(x: jnp.ndarray, k: int):
    w = jnp.asarray(_conv_weights(k), jnp.bfloat16)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )  # [B, nw, 128] exact integer counts <= k
    bits = out.astype(jnp.int32) & 1
    return _bits_to_u64(bits[..., :64]), _bits_to_u64(bits[..., 64:])


def strand_hashes_conv(codes: jnp.ndarray, k: int):
    """(fh, rh) u64 arrays of every k-window via the MXU conv; codes [B, L]."""
    return _strand_hashes_from_onehot(_onehot12(codes), k)


def canonical_hashes_conv(codes: jnp.ndarray, k: int) -> jnp.ndarray:
    """Canonical (fh + rh, wrapping u64) hash of every window; codes [B, L]."""
    fh, rh = strand_hashes_conv(codes, k)
    return fh + rh


def _multi_lo32(base: jnp.ndarray, k: int, h: int) -> jnp.ndarray:
    """Low 32 bits of all h derived hashes (nthash.hpp:261-266); trailing
    axis h.  Power-of-two filters only read the low word."""
    outs = [base]
    for i in range(1, h):
        mult = jnp.uint64(i) ^ (jnp.uint64(k) * jnp.uint64(int(nt.MULTI_SEED)))
        t = base * mult
        outs.append(t ^ (t >> jnp.uint64(nt.MULTI_SHIFT)))
    hs = jnp.stack(outs, axis=-1)
    return (hs & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)


def _pack_bits(pres: jnp.ndarray) -> jnp.ndarray:
    """bool [..., n] -> uint8 [..., ceil(n/8)] little-endian bit packing."""
    n = pres.shape[-1]
    pad = (-n) % 8
    if pad:
        pres = jnp.pad(pres, [(0, 0)] * (pres.ndim - 1) + [(0, pad)])
    b = pres.reshape(*pres.shape[:-1], -1, 8).astype(jnp.uint8)
    weights = jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8)
    return (b * weights).sum(axis=-1, dtype=jnp.uint8)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def scan_present_packed_gather(words, bits: int, h: int, k: int, codes):
    """Fused scan, XLA-gather probe (any filter size): codes u8 [B, L] ->
    packed presence u8 [B, ceil((L-k+1)/8)]."""
    base = canonical_hashes_conv(codes, k)
    lo = _multi_lo32(base, k, h)
    if bits & (bits - 1) == 0:
        idx = lo & jnp.uint32(bits - 1)
    else:
        idx = lo % jnp.uint32(bits)
    word = words[(idx >> jnp.uint32(5)).astype(jnp.int32)]
    pres = ((word >> (idx & jnp.uint32(31))) & jnp.uint32(1) != 0).all(axis=-1)
    return _pack_bits(pres)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def scan_present_packed2_gather(words, bits: int, h: int, k: int, L: int,
                                packed, exc_idx, exc_byte):
    """Fused scan over a 2-BIT PACKED transfer (1/4 the wire bytes of the
    raw path — the tunneled-chip h2d link is the scan's scarcest resource):
    packed u8 [B, ceil(L/4)] + sparse non-ACGT exceptions ->
    packed presence u8 [B, ceil((L-k+1)/8)].  Bit-exact with the raw scan
    for the full byte alphabet (the exceptions carry the raw bytes)."""
    clsf, clsr = _classes_from_packed(packed, L, exc_idx, exc_byte)
    fh, rh = _strand_hashes_from_onehot(_onehot12_from_classes(clsf, clsr), k)
    base = fh + rh
    lo = _multi_lo32(base, k, h)
    if bits & (bits - 1) == 0:
        idx = lo & jnp.uint32(bits - 1)
    else:
        idx = lo % jnp.uint32(bits)
    word = words[(idx >> jnp.uint32(5)).astype(jnp.int32)]
    pres = ((word >> (idx & jnp.uint32(31))) & jnp.uint32(1) != 0).all(axis=-1)
    return _pack_bits(pres)


@functools.partial(jax.jit, static_argnums=(1, 2, 3),
                   static_argnames=("interpret",))
def scan_present_packed_mxu(planes_i8, bits: int, h: int, k: int, codes,
                            interpret: bool = False):
    """Fused scan, int8 MXU one-hot probe (bits <= MXU_PROBE_MAX_BITS).

    interpret=True runs the Pallas probe in interpret mode — CPU-mesh tests
    of the sharded MXU path (no Mosaic backend off-TPU)."""
    from . import bloom_pallas

    base = canonical_hashes_conv(codes, k)
    lo = _multi_lo32(base, k, h)
    b_dim, nw = lo.shape[0], lo.shape[1]
    pres = bloom_pallas.probe_lo32_mxu_i8(
        planes_i8, bits, lo.reshape(-1, h), interpret=interpret
    ).reshape(b_dim, nw)
    return _pack_bits(pres)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4),
                   static_argnames=("interpret",))
def scan_present_packed2_mxu(planes_i8, bits: int, h: int, k: int, L: int,
                             packed, exc_idx, exc_byte,
                             interpret: bool = False):
    """2-bit-packed-transfer scan with the int8 MXU one-hot probe."""
    from . import bloom_pallas

    clsf, clsr = _classes_from_packed(packed, L, exc_idx, exc_byte)
    fh, rh = _strand_hashes_from_onehot(_onehot12_from_classes(clsf, clsr), k)
    lo = _multi_lo32(fh + rh, k, h)
    b_dim, nw = lo.shape[0], lo.shape[1]
    pres = bloom_pallas.probe_lo32_mxu_i8(
        planes_i8, bits, lo.reshape(-1, h), interpret=interpret
    ).reshape(b_dim, nw)
    return _pack_bits(pres)


def probe_kind(bits: int) -> str:
    """Probe the scanner would choose for a filter of `bits` — computable
    WITHOUT constructing (and uploading) one, so the A/B placement gate
    can key workload classes while the scanner stays lazy."""
    on_tpu = jax.devices()[0].platform == "tpu"
    pow2 = bits & (bits - 1) == 0
    return (
        "mxu" if on_tpu and pow2 and bits <= MXU_PROBE_MAX_BITS else "gather"
    )


class DeviceScanner:
    """Holds a Bloom filter's device residency and runs fused scans.

    Uploads the filter once (words, plus int8 one-hot planes when the
    filter fits the MXU probe budget and we are on a real TPU); every
    `scan_packed` call is one async device computation whose result the
    caller unpacks with `unpack_present`.

    Multi-device: with >1 visible device the scan SPMD-shards its rows over
    a 1-D ("dp",) jax Mesh with the filter replicated.  Because the scan
    pipeline (polish/scanpipe.py) packs CONTIG SEGMENTS into rows with a
    k-1-byte halo at every boundary, row sharding subsumes both contig data
    parallelism and sequence parallelism of long contigs — the halo
    exchange sequence-parallel scans normally need is already materialized
    in the packing, so devices need no collectives on the critical path
    (stats/outputs gather once per call).
    """

    def __init__(self, bf, force_probe: str | None = None):
        self.bits = int(bf.bits)
        self.h = int(bf.hash_num)
        self._planes = None
        self._mesh = None
        self._sharded_cache: dict = {}
        self.n_devices = len(jax.devices())
        on_tpu = jax.devices()[0].platform == "tpu"
        # Pallas interpret mode lets the MXU probe run on CPU-device meshes
        # (tests / multi-chip dryrun); real TPUs compile the Mosaic kernel
        self._interpret = not on_tpu
        self.probe = force_probe or probe_kind(self.bits)
        words = bf.words_u32()
        if self.n_devices > 1:
            # dp row sharding for BOTH probe kinds: the filter (words or
            # int8 planes) is replicated — it is <= a few MiB next to HBM —
            # and scan rows split over the mesh (the packing already carries
            # the k-1 halos, so shards need no collectives)
            from jax.sharding import Mesh, NamedSharding, PartitionSpec

            self._mesh = Mesh(np.array(jax.devices()), ("dp",))
            self._row_sharding = NamedSharding(
                self._mesh, PartitionSpec("dp", None)
            )
            repl = NamedSharding(self._mesh, PartitionSpec())
            self._words = jax.device_put(words, repl)
            if self.probe == "mxu":
                from . import bloom_pallas

                self._planes = jax.device_put(
                    bloom_pallas.words_to_planes_i8(words), repl
                )
        else:
            self._words = jnp.asarray(words)
            if self.probe == "mxu":
                from . import bloom_pallas

                self._planes = jnp.asarray(
                    bloom_pallas.words_to_planes_i8(words)
                )

    def _sharded_scan(self, kind: str, k: int, L: int = 0):
        """shard_map-wrapped scan for the dp mesh; cached per (kind, k, L).

        XLA's SPMD partitioner cannot split a pallas_call on its own, so the
        MXU probe shards via shard_map (each device runs the full fused
        program on its row shard against the replicated filter); the gather
        probe uses the same wrapper for uniformity."""
        key = (kind, k, L)
        fn = self._sharded_cache.get(key)
        if fn is not None:
            return fn
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        bits, h, mxu, interp = self.bits, self.h, self.probe == "mxu", self._interpret
        row = P("dp", None)
        if kind == "scan":
            def body(filt, codes):
                if mxu:
                    return scan_present_packed_mxu(
                        filt, bits, h, k, codes, interpret=interp
                    )
                return scan_present_packed_gather(filt, bits, h, k, codes)

            in_specs = (P(), row)
        else:
            def body(filt, packed, exc_idx, exc_byte):
                if mxu:
                    return scan_present_packed2_mxu(
                        filt, bits, h, k, L, packed, exc_idx, exc_byte,
                        interpret=interp,
                    )
                return scan_present_packed2_gather(
                    filt, bits, h, k, L, packed, exc_idx, exc_byte
                )

            in_specs = (P(), row, row, row)
        fn = jax.jit(shard_map(
            body, mesh=self._mesh, in_specs=in_specs, out_specs=row,
            check_vma=False,
        ))
        self._sharded_cache[key] = fn
        return fn

    # -- fused phase-A (scan + hot-site detect + candidate eval) ------------
    def enable_eval(self, eval_cfg, site_tables, force: bool = False) -> None:
        """Arm the fused scan+eval program (ops/scan_eval).

        On a dp mesh the program shard_maps over scan rows exactly like the
        plain scan (filter replicated): each device detects heads and
        evaluates sites on its own row shard, and the outputs stack on a
        leading shard axis that scan_eval_shards tells the consumer to
        merge (per-shard site indices are shard-row-local).  force=True is
        kept for CPU-mesh tests (GPTPU_DEVICE_EVAL=1) and now simply means
        "arm even where a measured A/B would be pointless"."""
        from . import scan_eval

        # the eval inherits the scanner's probe engine: int8 MXU one-hot
        # planes for production-size (<= 1 MiB pow2) filters, XLA gather
        # otherwise — every Bloom test in the fused program rides it
        self._eval = scan_eval.FusedEval(
            eval_cfg, self.bits, site_tables, probe=self.probe,
            interpret=self._interpret,
        )
        self._eval_s_max = eval_cfg.s_max
        self._eval_sharded = None
        if self._mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            row = P("dp", None)
            raw = self._eval.raw

            def body(filt, codes):
                (packed, n_sites, site, gate, sub, dele, lane, ok,
                 ins) = raw(filt, codes)
                # leading shard axis on the site-ish outputs (site indices
                # stay SHARD-ROW-LOCAL; the consumer adds the row offset)
                return (packed, n_sites[None], site[None], gate[None],
                        sub[None], dele[None], lane[None], ok[None],
                        ins[None])

            sh = lambda *rest: P("dp", *rest)  # noqa: E731
            self._eval_sharded = jax.jit(shard_map(
                body, mesh=self._mesh,
                in_specs=(P(), row),
                out_specs=(row, sh(), sh(None), sh(None, None),
                           sh(None, None), sh(None, None), sh(None),
                           sh(None), sh(None, None)),
                check_vma=False,
            ))

    @property
    def eval_enabled(self) -> bool:
        return getattr(self, "_eval", None) is not None

    @property
    def eval_shards(self) -> int:
        """Shard count of scan_eval_packed outputs (1 = unsharded).  When
        >1, the site-ish outputs stack per shard: site u32[n*S] with
        SHARD-ROW-LOCAL indices, n_sites i32[n], and the consumer maps
        shard s, local row r to global row s*rows_per_shard + r."""
        if getattr(self, "_eval_sharded", None) is not None:
            return self.n_devices
        return 1

    def scan_eval_packed(self, codes: np.ndarray, k: int):
        """Fused scan+eval call: codes u8 [R, L] -> 9-tuple of device arrays
        (see scan_eval.build_fused).  Async like scan_packed.  On a mesh
        the rows shard over dp (padded to a multiple of the device count;
        see eval_shards for the output layout)."""
        filt = self._planes if self._eval.probe == "mxu" else self._words
        if getattr(self, "_eval_sharded", None) is not None:
            codes = np.asarray(codes)
            if codes.ndim == 1:
                codes = codes[None, :]
            b = codes.shape[0]
            pad = (-b) % self.n_devices
            if pad:
                # pad rows with 'A': pad windows probe like real sequence
                # and any heads they produce fall outside every segment
                codes = np.pad(codes, ((0, pad), (0, 0)),
                               constant_values=ord("A"))
            codes = jax.device_put(codes, self._row_sharding)
            return self._eval_sharded(filt, codes)
        return self._eval(filt, jnp.asarray(codes))

    @property
    def _filter_arg(self):
        return self._planes if self.probe == "mxu" else self._words

    @property
    def preferred_rows(self) -> int:
        """Scan-call row count the pipeline should use (>=1 per device)."""
        return max(4, self.n_devices) if self._mesh is not None else 4

    def scan_packed(self, codes: np.ndarray, k: int):
        """codes u8 [B, L] (host or device) -> device u8 [B, ceil(nw/8)].

        Returns the un-fetched device array (async); np.asarray() it to
        materialize.
        """
        if self._mesh is not None:
            codes = np.asarray(codes)
            if codes.ndim == 1:
                codes = codes[None, :]
            b = codes.shape[0]
            pad = (-b) % self.n_devices
            if pad:
                codes = np.pad(codes, ((0, pad), (0, 0)))
            codes = jax.device_put(codes, self._row_sharding)
            out = self._sharded_scan("scan", k)(self._filter_arg, codes)
            return out[:b]
        codes = jnp.asarray(codes)
        if codes.ndim == 1:
            codes = codes[None, :]
        if self._planes is not None:
            return scan_present_packed_mxu(
                self._planes, self.bits, self.h, k, codes,
                interpret=self._interpret,
            )
        return scan_present_packed_gather(
            self._words, self.bits, self.h, k, codes
        )

    def scan_packed2(self, packed: np.ndarray, exc_idx: np.ndarray,
                     exc_byte: np.ndarray, k: int, L: int):
        """2-bit-packed-transfer variant of scan_packed: packed u8
        [B, ceil(L4/4)] + per-row exception arrays (idx >= L entries are
        padding).  1/4 the h2d bytes of the raw path."""
        if self._mesh is not None:
            b = packed.shape[0]
            pad = (-b) % self.n_devices
            if pad:
                packed = np.pad(packed, ((0, pad), (0, 0)))
                exc_idx = np.pad(
                    exc_idx, ((0, pad), (0, 0)), constant_values=L
                )
                exc_byte = np.pad(exc_byte, ((0, pad), (0, 0)))
            args = (
                jax.device_put(packed, self._row_sharding),
                jax.device_put(exc_idx, self._row_sharding),
                jax.device_put(exc_byte, self._row_sharding),
            )
            out = self._sharded_scan("scan2", k, L)(self._filter_arg, *args)
            return out[:b]
        args = (jnp.asarray(packed), jnp.asarray(exc_idx), jnp.asarray(exc_byte))
        if self._planes is not None:
            return scan_present_packed2_mxu(
                self._planes, self.bits, self.h, k, L, *args,
                interpret=self._interpret,
            )
        return scan_present_packed2_gather(
            self._words, self.bits, self.h, k, L, *args
        )

    @staticmethod
    def unpack_present(packed: np.ndarray, nw: int) -> np.ndarray:
        """Packed u8 row -> bool[nw]."""
        return np.unpackbits(packed, bitorder="little")[:nw].astype(bool)
