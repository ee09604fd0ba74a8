"""Fixtures taken verbatim from the reference repo's shipped artifacts.

The only reference-produced KCF content that ships with the reference
repo is the example header embedded in its README (README.md:376-437,
lettuce chr3 run). No JVM exists in this image, so these fixtures are
the closest available ground truth: the header must parse exactly, the
machine-generated lines must re-emit byte-identically, and the INFO/
FORMAT declaration blocks must match Utils/Configs.java:14-37 verbatim.

Also: %.2f rounding-tie sweeps over the full INFO surface (MS/MO and
the per-sample KD/SC fields), exercising the mixed float32/float64
accumulation of Window.calculateStats (Window.java:177-214) through
both the native row formatter and the exact Python fallback.
"""

import decimal

import numpy as np

from kcftools_tpu.io.kcf import (
    KCFHeader,
    WindowBlock,
    format_block_bytes,
    format_block_rows,
)
from kcftools_tpu.utils import javafmt

# assembled from the code blocks of /root/reference/README.md:376-437,
# in the emission order of KCFHeader.toString (KCFHeader.java:291-330)
README_HEADER = """\
##format=KCF0.1
##date=2024-12-05
##source=kcftools
##reference=lsatv11.chr3.fasta
##contig=<ID=chr3,length=324658466>
##INFO=<ID=IS,Type=Float,Description="Minimum score for the window">
##INFO=<ID=XS,Type=Float,Description="Maximum score for the window">
##INFO=<ID=MS,Type=Float,Description="Mean score for the window">
##INFO=<ID=IO,Type=Integer,Description="Minimum observed kmers in the window">
##INFO=<ID=XO,Type=Integer,Description="Maximum observed kmers in the window">
##INFO=<ID=MO,Type=Integer,Description="Mean observed kmers in the window">
##INFO=<ID=IV,Type=Integer,Description="Minimum variations in the window">
##INFO=<ID=XV,Type=Integer,Description="Maximum variations in the window">
##INFO=<ID=MV,Type=Integer,Description="Mean variations in the window">
##FORMAT=<ID=IB,Type=Integer,Description="IBS number">
##FORMAT=<ID=VA,Type=Integer,Description="Variations">
##FORMAT=<ID=OB,Type=Integer,Description="Observed kmers">
##FORMAT=<ID=ID,Type=Integer,Description="Inner distance">
##FORMAT=<ID=LD,Type=Integer,Description="Left tail distance">
##FORMAT=<ID=RD,Type=Integer,Description="Right tail distance">
##FORMAT=<ID=SC,Type=Float,Description="Score">
##PARAM=<ID=window,value=50000>
##PARAM=<ID=kmer,value=31>
##PARAM=<ID=IBS,value=false>
##PARAM=<ID=nwindow,value=6498>
##CMD=kcftools-0.0.1-SNAPSHOT.jar getVariations -k lsal.chr3 -o lsal.kcftools.kcf -r lsatv11.chr3.fasta -s lsal -t 24 -w 50000
#CHROM\tSTART\tEND\tID\tTOTAL_KMERS\tINFO\tFORMAT\tlsal
"""

# Utils/Configs.java:14-26 KCF_INFO_LINES, verbatim (current version)
CONFIGS_INFO_LINES = [
    '<ID=EFFLEN,Type=Integer,Description="Effective length of the window">',
    '<ID=IS,Type=Float,Description="Minimum score for the window">',
    '<ID=XS,Type=Float,Description="Maximum score for the window">',
    '<ID=MS,Type=Float,Description="Mean score for the window">',
    '<ID=IO,Type=Integer,Description="Minimum observed kmers in the window">',
    '<ID=XO,Type=Integer,Description="Maximum observed kmers in the window">',
    '<ID=MO,Type=Integer,Description="Mean observed kmers in the window">',
    '<ID=IV,Type=Integer,Description="Minimum variations in the window">',
    '<ID=XV,Type=Integer,Description="Maximum variations in the window">',
    '<ID=MV,Type=Integer,Description="Mean variations in the window">',
]

# Utils/Configs.java:27-37 KCF_FORMAT_LINES, verbatim (current version)
CONFIGS_FORMAT_LINES = [
    '<ID=IB,Type=Integer,Description="IBS number">',
    '<ID=VA,Type=Integer,Description="Variations">',
    '<ID=OB,Type=Integer,Description="Observed kmers">',
    '<ID=ID,Type=Integer,Description="Inner Distance">',
    '<ID=LD,Type=Integer,Description="Kmer Variation Distance at the leftTail">',
    '<ID=RD,Type=Integer,Description="Kmer Variation Distance at the rightTail">',
    '<ID=KD,Type=Float,Description="Mean Kmer Depth">',
    '<ID=SC,Type=Float,Description="Score">',
]


def test_readme_header_parses():
    h = KCFHeader.parse(README_HEADER)
    assert h.reference == "lsatv11.chr3.fasta"
    assert h.contigs == [("chr3", 324658466)]
    assert h.window_size == 50000
    assert h.kmer_size == 31
    assert h.is_ibs is False
    assert h.window_count == 6498
    assert h.step_size == 0
    assert h.samples == ["lsal"]
    assert h.command_lines == [
        "kcftools-0.0.1-SNAPSHOT.jar getVariations -k lsal.chr3 -o "
        "lsal.kcftools.kcf -r lsatv11.chr3.fasta -s lsal -t 24 -w 50000"
    ]


def test_readme_header_reemits_machine_lines_byte_identically():
    """Every line whose content survives a parse -> emit round trip must
    come back byte-for-byte: contig, the four PARAMs, CMD, #CHROM."""
    h = KCFHeader.parse(README_HEADER)
    emitted = h.to_string().split("\n")
    for line in (
        "##contig=<ID=chr3,length=324658466>",
        "##PARAM=<ID=window,value=50000>",
        "##PARAM=<ID=kmer,value=31>",
        "##PARAM=<ID=IBS,value=false>",
        "##PARAM=<ID=nwindow,value=6498>",
        "##CMD=kcftools-0.0.1-SNAPSHOT.jar getVariations -k lsal.chr3 -o "
        "lsal.kcftools.kcf -r lsatv11.chr3.fasta -s lsal -t 24 -w 50000",
        "##reference=lsatv11.chr3.fasta",
        "#CHROM\tSTART\tEND\tID\tTOTAL_KMERS\tINFO\tFORMAT\tlsal",
    ):
        assert line in emitted, line
    # PARAM emission order matches the reference (window, step, kmer,
    # IBS, nwindow, then weights; absent params are skipped)
    params = [l for l in emitted if l.startswith("##PARAM=")]
    keys = [p.split("ID=")[1].split(",")[0] for p in params]
    assert keys == ["window", "kmer", "IBS", "nwindow"]


def test_readme_header_roundtrip_stable():
    h = KCFHeader.parse(README_HEADER)
    h2 = KCFHeader.parse(h.to_string())
    assert h2.to_string() == h.to_string()
    assert h2.contigs == h.contigs
    assert h2.params == h.params
    assert h2.samples == h.samples


def test_info_format_blocks_match_configs_java():
    """Emitted ##INFO/##FORMAT declarations are byte-identical to the
    reference's current Configs enum (Utils/Configs.java:14-37)."""
    h = KCFHeader()
    lines = h.to_string().split("\n")
    info = [l[7:] for l in lines if l.startswith("##INFO=")]
    fmt = [l[9:] for l in lines if l.startswith("##FORMAT=")]
    assert info == CONFIGS_INFO_LINES
    assert fmt == CONFIGS_FORMAT_LINES


# -- %.2f tie sweeps over the INFO + sample fields --------------------------


def _java_f2(x: float) -> str:
    """Independent oracle for Java String.format("%.2f", x): HALF_UP on
    the exact decimal expansion of the double (java.util.Formatter)."""
    d = decimal.Decimal(float(x)).quantize(
        decimal.Decimal("0.01"), rounding=decimal.ROUND_HALF_UP
    )
    return str(d)


def test_f2_tie_sweep_dense():
    """Sweep every representable double nearest to k/1000 for k in a
    dense grid (thousands of exact and near ties) plus float32-widened
    values (the IS/XS/MS/MO path)."""
    for k in range(0, 40000, 7):
        x = k / 1000.0
        assert javafmt.f2(x) == _java_f2(x), x
        xf = float(np.float32(x))
        assert javafmt.f2(xf) == _java_f2(xf), xf


def _random_block(rng, n, s, tie_heavy=False):
    block = WindowBlock(n, [f"smp{j}" for j in range(s)])
    block.seq_names = ["chrT"] * n
    block.start = np.arange(n, dtype=np.int64) * 100
    block.end = block.start + 100
    block.window_id = [f"chrT_{i * 100}" for i in range(n)]
    block.total_kmers = rng.integers(0, 90, n).astype(np.int64)
    block.eff_length = rng.integers(0, 100, n).astype(np.int64)
    for j in range(s):
        block.ob[j] = rng.integers(0, 90, n)
        block.va[j] = rng.integers(0, 20, n)
        block.inner[j] = rng.integers(0, 50, n)
        block.left[j] = rng.integers(0, 10, n)
        block.right[j] = rng.integers(0, 10, n)
        if tie_heavy:
            # counts that make mean = count/observed land on x.xx5 ties
            ob = np.maximum(block.ob[j], 1)
            block.kmer_count[j] = (
                ob * rng.integers(0, 40, n)
                + (ob * rng.integers(0, 200, n)) // 8
            )
            block.ob[j] = ob
        else:
            block.kmer_count[j] = rng.integers(0, 5000, n)
    block.finalize((0.3, 0.3, 0.4))
    return block


def test_native_formatter_ties_match_python_full_surface():
    """The native row formatter (with its %.2f tie re-render) emits
    byte-identical rows to the exact Python path across random and
    tie-heavy blocks - covers MS/MO (INFO) and KD/SC (samples)."""
    rng = np.random.default_rng(7)
    for tie_heavy in (False, True):
        for s in (1, 3, 7):
            block = _random_block(rng, 400, s, tie_heavy)
            fast = format_block_bytes(block)
            exact = ("\n".join(format_block_rows(block)) + "\n").encode()
            assert fast == exact


def test_info_ms_mo_mv_mixed_float32_semantics():
    """MS accumulates in float64, MO/MV in float32 step-by-step
    (Window.calculateStats, Window.java:184-213); MV renders via Java
    Float.toString. Verified against a direct per-window transcription."""
    rng = np.random.default_rng(11)
    s, n = 5, 200
    block = _random_block(rng, n, s)
    rows = list(format_block_rows(block))
    for i in range(n):
        info = rows[i].split("\t")[5]
        fields = dict(kv.split("=") for kv in info.split(";"))
        mo = np.float32(0.0)
        mv = np.float32(0.0)
        ms = 0.0
        for j in range(s):
            mo = np.float32(mo + np.float32(block.ob[j][i]))
            mv = np.float32(mv + np.float32(block.va[j][i]))
            ms += float(block.score[j][i])
        mo = np.float32(mo / np.float32(s))
        mv = np.float32(mv / np.float32(s))
        ms = ms / s
        assert fields["MO"] == _java_f2(float(mo))
        assert fields["MV"] == javafmt.flt(mv)
        assert fields["MS"] == _java_f2(ms)
