"""swipe-tpu: a TPU-native Smith-Waterman database-search engine.

A from-scratch JAX/Pallas rebuild of the capabilities of SWIPE
(Rognes 2011, https://github.com/torognes/swipe): exhaustive optimal
local-alignment search of protein/nucleotide queries against large sequence
databases, with BLAST-compatible statistics, formats and search modes
(blastn/blastp/blastx/tblastn/tblastx).

Architecture (TPU-first, not a port):
  * the inter-sequence SIMD DP of SWIPE's search7/16/63 kernels becomes a
    Pallas kernel packing hundreds of length-sorted database sequences into
    the VPU lanes, with the substitution-score gather done as a one-hot
    matmul on the MXU;
  * the per-lane refill machine becomes host-side length-sorted batch
    packing (static shapes for XLA);
  * the pthreads work queue + MPI master/slave become shard_map over a
    device mesh with lax.top_k merges and psum counters;
  * the 7->16->63-bit precision escalation becomes an optional
    saturation-emulating cascade — the primary path is a single exact
    int32 pass, which on the 32-bit-lane TPU VPU is as fast as a narrow
    tier would be.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy public API (keeps bare import light; jax loads on first use)."""
    if name in ("SearchEngine", "SearchParams", "SearchTimings"):
        from . import pipeline
        return getattr(pipeline, name)
    if name in ("FastaDatabase",):
        from .io.db import FastaDatabase
        return FastaDatabase
    if name in ("BlastDatabase",):
        from .io.blastdb import BlastDatabase
        return BlastDatabase
    if name in ("read_queries", "preprocess_query"):
        from .io import fasta
        return getattr(fasta, name)
    if name in ("ScoreMatrix",):
        from .matrices import ScoreMatrix
        return ScoreMatrix
    raise AttributeError(name)
