"""BGEN genotype loader (layouts 1 and 2, biallelic diploid).

Parity: genotypebgen.cpp — reads expected allele-2 dosages from BGEN
probability data, biallelic + diploid only (genotypebgen.cpp:106-122),
computing per-variant mean/std on the fly and feeding the same
genotype containers as the PLINK path.  Layout 1 (--bgen-l1,
options.cpp:1118) and the reference's libbgen visitor machinery map
onto a pure-Python parser of the v1.1/1.2/1.3 spec: per-variant blocks
of zlib/zstd-compressed probabilities (layout 1: three uint16s per
individual scaled by 32768; layout 2: bit-packed with per-sample
ploidy).

Because dosages are continuous, the loader exposes them as float32
(GenotypeAttributes::dosages analog); the REML/GWAS layers treat them
like standardized genotype rows without the 2-bit decode path.
"""

from __future__ import annotations

import dataclasses
import struct
import zlib
from typing import List, Optional, Tuple

try:  # zstd-compressed BGEN (spec v1.3); gated — not all builds ship it
    import zstandard as _zstd
except ImportError:  # pragma: no cover
    _zstd = None

import numpy as np

from dissect_tpu.io.bed import IndividualInfo, SnpInfo, SnpStats


@dataclasses.dataclass
class BgenData:
    snps: List[SnpInfo]
    individuals: List[IndividualInfo]
    dosages: np.ndarray  # (M, N) float32, NaN = missing

    @property
    def n_snps(self) -> int:
        return len(self.snps)

    @property
    def n_individuals(self) -> int:
        return len(self.individuals)

    @property
    def individual_keys(self) -> List[str]:
        return [ind.key for ind in self.individuals]

    @property
    def snp_names(self) -> List[str]:
        return [s.name for s in self.snps]

    def stats(self) -> SnpStats:
        """Per-variant dosage statistics in SnpStats form so BGEN data
        flows through the same GRM/GWAS pipeline as PLINK hard calls
        (genotypebgen.cpp on-the-fly mean/std accumulation).  p2 is the
        mean dosage / 2; std is the EMPIRICAL dosage std (the reference
        uses sample std for imputed data, not sqrt(2p(1-p)))."""
        observed = ~np.isnan(self.dosages)
        n = observed.sum(axis=1)
        mean = np.nansum(self.dosages, axis=1) / np.maximum(n, 1)
        var = np.nansum(
            np.where(observed, (self.dosages - mean[:, None]) ** 2, 0.0), axis=1
        ) / np.maximum(n - 1, 1)
        p2 = mean / 2.0
        stats = SnpStats(
            n_nonmissing=n, p1=1.0 - p2, p2=p2, std=np.sqrt(var)
        )
        return stats

    # --- PlinkData-protocol compatibility ------------------------------------
    def decode_chunk(self, start: int, stop: int) -> np.ndarray:
        return self.dosages[start:stop]

    def iter_chunks(self, chunk_size: int):
        for start in range(0, self.n_snps, chunk_size):
            stop = min(start + chunk_size, self.n_snps)
            yield start, stop, self.dosages[start:stop]

    def filter(self, keep_snps=None, keep_individuals=None) -> "BgenData":
        snp_idx = np.arange(self.n_snps)
        ind_idx = np.arange(self.n_individuals)
        snps, individuals = self.snps, self.individuals
        if keep_snps is not None:
            index = {s.name: i for i, s in enumerate(self.snps)}
            snp_idx = np.array([index[nm] for nm in keep_snps], dtype=np.int64)
            snps = [self.snps[i] for i in snp_idx]
        if keep_individuals is not None:
            index = {ind.key: i for i, ind in enumerate(self.individuals)}
            ind_idx = np.array(
                [index[k] for k in keep_individuals], dtype=np.int64
            )
            individuals = [self.individuals[i] for i in ind_idx]
        return BgenData(
            snps=snps,
            individuals=individuals,
            dosages=self.dosages[np.ix_(snp_idx, ind_idx)],
        )


def _read_string(buf: memoryview, pos: int, len_bytes: int = 2) -> Tuple[str, int]:
    (ln,) = struct.unpack_from("<H" if len_bytes == 2 else "<I", buf, pos)
    pos += len_bytes
    s = bytes(buf[pos : pos + ln]).decode("utf-8", errors="replace")
    return s, pos + ln


def read_bgen(
    path: str,
    sample_path: Optional[str] = None,
    max_variants: Optional[int] = None,
    native: bool = True,
) -> BgenData:
    with open(path, "rb") as fh:
        raw = fh.read()
    buf = memoryview(raw)
    (offset,) = struct.unpack_from("<I", buf, 0)
    (header_len, n_variants, n_samples) = struct.unpack_from("<III", buf, 4)
    magic = bytes(buf[16:20])
    if magic not in (b"bgen", b"\x00\x00\x00\x00"):
        raise ValueError(f"{path}: bad BGEN magic {magic!r}")
    (flags,) = struct.unpack_from("<I", buf, 4 + header_len - 4)
    compression = flags & 0x3  # 0 none, 1 zlib, 2 zstd
    layout = (flags >> 2) & 0xF
    has_sample_ids = (flags >> 31) & 0x1
    if layout not in (1, 2):
        raise ValueError(f"{path}: unsupported BGEN layout {layout}")
    if compression == 2 and _zstd is None:
        raise ValueError(
            f"{path}: zstd-compressed BGEN needs the zstandard module"
        )

    pos = 4 + header_len
    individuals: List[IndividualInfo] = []
    if has_sample_ids:
        (_block_len, n_ids) = struct.unpack_from("<II", buf, pos)
        pos += 8
        for _ in range(n_ids):
            sid, pos = _read_string(buf, pos)
            individuals.append(IndividualInfo(family_id=sid, individual_id=sid))
    elif sample_path:
        with open(sample_path) as fh:
            lines = [l.split() for l in fh if l.strip()]
        for parts in lines[2:]:  # .sample files have 2 header lines
            individuals.append(IndividualInfo(parts[0], parts[1]))
    else:
        individuals = [IndividualInfo(f"sample_{i}", f"sample_{i}") for i in range(n_samples)]

    # --- pass 1: index the variant blocks (cheap header scan) -------------
    pos = offset + 4
    cand_snps: List[SnpInfo] = []
    offs: List[int] = []
    lens: List[int] = []
    n_to_read = n_variants if max_variants is None else min(max_variants, n_variants)
    for _ in range(n_to_read):
        if layout == 1:
            # v1.1 blocks lead with N and are always biallelic
            (n_block,) = struct.unpack_from("<I", buf, pos)
            pos += 4
        _vid, pos = _read_string(buf, pos)
        rsid, pos = _read_string(buf, pos)
        chrom, pos = _read_string(buf, pos)
        (bp,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        if layout == 1:
            n_alleles = 2
        else:
            (n_alleles,) = struct.unpack_from("<H", buf, pos)
            pos += 2
        alleles = []
        for _ in range(n_alleles):
            a, pos = _read_string(buf, pos, len_bytes=4)
            alleles.append(a)
        if layout == 1:
            if compression == 1:
                (geno_len,) = struct.unpack_from("<I", buf, pos)
                pos += 4
            else:
                geno_len = 6 * n_samples
        else:
            (geno_len,) = struct.unpack_from("<I", buf, pos)
            pos += 4
        if n_alleles == 2:  # biallelic only (genotypebgen.cpp:106-122)
            cand_snps.append(SnpInfo(chrom, rsid, 0.0, bp, alleles[0], alleles[1]))
            offs.append(pos)
            lens.append(geno_len)
        pos += geno_len

    # --- pass 2: bulk probability decode (native OpenMP, Python fallback) -
    m = len(cand_snps)
    dosages = np.zeros((m, n_samples), dtype=np.float32)
    decoded = np.zeros(m, dtype=bool)
    if native and m:
        try:
            from dissect_tpu.native import bgen_native

            if bgen_native.available():
                dosages, status = bgen_native.decode_blocks(
                    raw, np.asarray(offs), np.asarray(lens),
                    n_samples, compression, layout,
                )
                decoded = status == 0
        except Exception:
            decoded = np.zeros(m, dtype=bool)
    for i in range(m):
        if decoded[i]:
            continue
        dosage = _decode_block_py(
            buf[offs[i] : offs[i] + lens[i]], n_samples, compression, layout
        )
        if dosage is not None:
            dosages[i] = dosage
            decoded[i] = True

    snps = [s for i, s in enumerate(cand_snps) if decoded[i]]
    dosages = dosages[decoded] if m else np.zeros((0, n_samples), np.float32)
    return BgenData(snps=snps, individuals=individuals, dosages=dosages)


def _decode_block_py(
    geno_block: memoryview, n_samples: int, compression: int, layout: int
) -> Optional[np.ndarray]:
    """Pure-Python decode of one genotype block (fallback path)."""
    if layout == 1:
        data = (
            zlib.decompress(bytes(geno_block))
            if compression == 1
            else bytes(geno_block)
        )
        return _parse_layout1_dosage(data, n_samples)
    if compression == 1:
        (uncompressed_len,) = struct.unpack_from("<I", geno_block, 0)
        data = zlib.decompress(bytes(geno_block[4:]))
    elif compression == 2:
        (uncompressed_len,) = struct.unpack_from("<I", geno_block, 0)
        data = _zstd.ZstdDecompressor().decompress(
            bytes(geno_block[4:]), max_output_size=uncompressed_len
        )
    else:
        data = bytes(geno_block)
    return _parse_layout2_dosage(data, n_samples)


def _parse_layout1_dosage(data: bytes, n_samples: int) -> Optional[np.ndarray]:
    """Expected allele-2 dosage from a layout-1 (v1.1) probability block:
    three uint16 probabilities P(AA), P(AB), P(BB) per individual scaled
    by 32768; an all-zero triple marks a missing genotype."""
    if len(data) != 6 * n_samples:
        return None
    probs = np.frombuffer(data, dtype="<u2").reshape(n_samples, 3) / 32768.0
    psum = probs.sum(axis=1)
    missing = psum <= 0.0
    safe = np.where(missing, 1.0, psum)
    dosage = ((probs[:, 1] + 2.0 * probs[:, 2]) / safe).astype(np.float32)
    dosage[missing] = np.nan
    return dosage


def _parse_layout2_dosage(data: bytes, n_samples: int) -> Optional[np.ndarray]:
    """Expected allele-2 dosage from a layout-2 probability block."""
    n, n_alleles, min_pl, max_pl = struct.unpack_from("<IHBB", data, 0)
    if n != n_samples or n_alleles != 2:
        return None
    ploidy = np.frombuffer(data, dtype=np.uint8, count=n, offset=8)
    missing = (ploidy & 0x80) != 0
    ploidy_val = ploidy & 0x3F
    if not np.all(ploidy_val[~missing] == 2):
        return None  # diploid only
    phased, bits = struct.unpack_from("<BB", data, 8 + n)
    probs_raw = np.frombuffer(data, dtype=np.uint8, offset=10 + n)
    denom = float((1 << bits) - 1)
    if phased:
        # 2 haplotypes x 1 stored probability each = P(allele1);
        # expected allele2 dosage = sum over haplotypes of (1 - P(allele1))
        vals = _unpack_bits(probs_raw, bits, 2 * n).reshape(n, 2) / denom
        dosage = (1.0 - vals).sum(axis=1)
    else:
        # 2 stored genotype probabilities: P(11), P(12); P(22) implicit
        vals = _unpack_bits(probs_raw, bits, 2 * n).reshape(n, 2) / denom
        p11, p12 = vals[:, 0], vals[:, 1]
        p22 = np.clip(1.0 - p11 - p12, 0.0, 1.0)
        dosage = p12 + 2.0 * p22
    dosage = dosage.astype(np.float32)
    dosage[missing] = np.nan
    return dosage


def write_bgen(
    path: str,
    data: BgenData,
    bits: int = 8,
    layout: int = 2,
    compression: str = "zlib",
):
    """Write BGEN (fixture generation + interop testing; hard genotypes
    get probability 1).  layout 2: zlib/zstd/none 8/16-bit unphased;
    layout 1 (v1.1): uint16 probability triples, zlib or none."""
    if bits not in (8, 16):
        raise ValueError("writer supports 8- or 16-bit probabilities")
    comp_code = {"none": 0, "zlib": 1, "zstd": 2}[compression]
    if comp_code == 2 and (layout == 1 or _zstd is None):
        raise ValueError("zstd requires layout 2 and the zstandard module")
    n = data.n_individuals
    chunks = []
    # header
    header = struct.pack("<III4s", 20, data.n_snps, n, b"bgen")
    flags = comp_code | (layout << 2) | (1 << 31)
    header += struct.pack("<I", flags)
    # sample identifier block
    ids = b""
    for ind in data.individuals:
        s = ind.individual_id.encode()
        ids += struct.pack("<H", len(s)) + s
    sample_block = struct.pack("<II", 8 + len(ids), n) + ids
    offset = len(header) + len(sample_block)
    chunks.append(struct.pack("<I", offset))
    chunks.append(header)
    chunks.append(sample_block)
    dtype = "<u1" if bits == 8 else "<u2"
    denom = (1 << bits) - 1
    for i, snp in enumerate(data.snps):
        vid = snp.name.encode()
        chrom = snp.chromosome.encode()
        var = b"" if layout == 2 else struct.pack("<I", n)
        var += struct.pack("<H", len(vid)) + vid
        var += struct.pack("<H", len(vid)) + vid
        var += struct.pack("<H", len(chrom)) + chrom
        var += struct.pack("<I", snp.position_bp)
        if layout == 2:
            var += struct.pack("<H", 2)
        for allele in (snp.allele1, snp.allele2):
            a = allele.encode()
            var += struct.pack("<I", len(a)) + a
        d = data.dosages[i]
        missing = np.isnan(d)
        dd = np.where(missing, 0.0, d)
        # hard-call style: represent expected dosage via p12/p22 mix
        p22 = np.clip(dd - 1.0, 0.0, 1.0)
        p12 = np.clip(dd - 2.0 * p22, 0.0, 1.0)
        p11 = np.clip(1.0 - p12 - p22, 0.0, 1.0)
        if layout == 1:
            probs = np.stack([p11, p12, p22], axis=1)
            vals = np.round(probs * 32768.0).astype("<u2")
            vals[missing] = 0  # all-zero triple = missing (v1.1 spec)
            payload = vals.tobytes()
            if comp_code == 1:
                comp = zlib.compress(payload)
                geno = struct.pack("<I", len(comp)) + comp
            else:
                geno = payload
        else:
            probs = np.stack([p11, p12], axis=1)
            vals = np.round(probs * denom).astype(dtype)
            ploidy = np.full(n, 2, dtype=np.uint8)
            ploidy[missing] = 2 | 0x80
            payload = (
                struct.pack("<IHBB", n, 2, 2, 2)
                + ploidy.tobytes()
                + struct.pack("<BB", 0, bits)
                + vals.tobytes()
            )
            if comp_code == 0:
                geno = struct.pack("<I", len(payload)) + payload
            else:
                comp = (
                    zlib.compress(payload)
                    if comp_code == 1
                    else _zstd.ZstdCompressor().compress(payload)
                )
                geno = (
                    struct.pack("<I", len(comp) + 4)
                    + struct.pack("<I", len(payload))
                    + comp
                )
        chunks.append(var + geno)
    with open(path, "wb") as fh:
        fh.write(b"".join(chunks))


def _unpack_bits(raw: np.ndarray, bits: int, count: int) -> np.ndarray:
    """Unpack little-endian bit-packed unsigned ints of width `bits`."""
    if bits == 8:
        return raw[:count].astype(np.float64)
    if bits == 16:
        return np.frombuffer(raw.tobytes(), dtype="<u2", count=count).astype(np.float64)
    if bits == 32:
        return np.frombuffer(raw.tobytes(), dtype="<u4", count=count).astype(np.float64)
    expanded = np.unpackbits(raw, bitorder="little")
    usable = (len(expanded) // bits) * bits
    chunks = expanded[:usable].reshape(-1, bits)[:count]
    weights = (1 << np.arange(bits)).astype(np.float64)
    return chunks @ weights
