"""Golden parity over an AUTHENTIC NCBI-produced BLAST v4 database.

Every other golden database in this suite was written by this repo's
own writer or its independent test byte-packer; a convention gap both
in-house writers share would be invisible (the round-3 review's gap #2).
This module closes it when a real ``formatdb``/``makeblastdb`` artifact
is present at ``tests/data/authentic/`` — generated OUT OF BAND by
``tools/make_authentic_fixture.sh`` on a machine with the NCBI toolchain
(this build environment has neither the tools nor network egress; see
NOTES_ROUND4.md).  The tests activate automatically once the fixture
exists; until then they skip with a pointer to the script.

What still covers the writer/reader meanwhile: the reference binary —
an independent reader hardened on real NCBI output
(/root/reference/database.cc:515-601) — parses this repo's writer
output byte-for-byte in every other golden module, and
``test_golden_foreign_db`` parses artifacts from an independent packer.
"""

import os

import pytest

from test_golden_parity import _normalize, ref_swipe, run_ours, run_ref  # noqa: F401

AUTH = os.path.join(os.path.dirname(__file__), "data", "authentic")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(AUTH, "aprot.pin")),
    reason="no authentic NCBI fixture; generate with "
           "tools/make_authentic_fixture.sh on a machine with "
           "formatdb/makeblastdb")


@pytest.fixture()
def qfiles(tmp_path):
    qp = tmp_path / "qp.fa"
    qp.write_text(">qa authentic protein query\n"
                  "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQAPILSRVGDGTQDNLS\n")
    qn = tmp_path / "qn.fa"
    qn.write_text(">qb authentic nucleotide query\n"
                  "ACGTACGTAGCTAGCTAGACGTACGTGGGCCCAAATTT\n")
    return str(qp), str(qn)


@pytest.mark.parametrize("mode,db,qi,extra", [
    ("blastp", "aprot", 0, []),
    ("blastp", "aprot", 0, ["-m", "9"]),
    ("blastn", "anucl", 1, ["-e", "1000"]),
    ("tblastn", "anucl", 0, ["-e", "1000", "-m", "8"]),
    ("blastx", "aprot", 1, ["-e", "1000"]),
])
def test_golden_authentic(ref_swipe, qfiles, mode, db, qi, extra):  # noqa: F811
    """Search output over the authentic artifact must be byte-identical
    to the reference binary's — this reader vs NCBI's writer."""
    args = ["-p", mode, "-d", os.path.join(AUTH, db), "-i", qfiles[qi]] \
        + extra
    assert _normalize(run_ours(args)) == _normalize(run_ref(ref_swipe, args))


@pytest.mark.parametrize("db,flag", [("aprot", "1"), ("anucl", "1"),
                                     ("anucl", "2")])
def test_golden_authentic_dump(ref_swipe, db, flag):  # noqa: F811
    """-N dump reconstruction from the authentic artifact (sequence
    re-symbolization + ASN.1 deflines over NCBI's own bytes)."""
    args = ["-p", "blastp" if db == "aprot" else "blastn",
            "-d", os.path.join(AUTH, db), "-N", flag]
    assert _normalize(run_ours(args)) == _normalize(run_ref(ref_swipe, args))
