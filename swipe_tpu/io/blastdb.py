"""NCBI BLAST v4 database reader (placeholder — implemented next milestone).

Will be byte-compatible with the reference's reader (database.cc:515-1413):
.pin/.phr/.psq (protein) and .nin/.nhr/.nsq (nucleotide) volumes, .pal/.nal
alias files, .msk masked subsets, taxid filtering and ASN.1 deflines.
"""

from __future__ import annotations


class BlastDatabase:  # pragma: no cover - placeholder
    def __init__(self, basename: str, taxid_file: str | None = None):
        raise NotImplementedError(
            "BLAST database support lands in the next milestone; "
            "use a FASTA database for now.")
