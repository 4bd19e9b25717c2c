#!/bin/sh
# Build the AUTHENTIC NCBI-produced BLAST v4 fixture for
# tests/test_golden_authentic_db.py.
#
# The round-3 review asked for a database whose bytes were produced by
# neither this repo's writer nor its test packer — only NCBI's own
# formatdb/makeblastdb can author that, and neither tool (nor network
# egress to fetch one) exists in the build environment, so the fixture
# is generated OUT OF BAND by running this script on any machine with
# the NCBI toolchain, then checking the resulting directory in at
# tests/data/authentic/.  The test activates automatically once the
# files exist and skips (loudly) until then.
#
# formatdb (legacy C toolkit) is preferred: it writes v4 natively.
# makeblastdb from BLAST+ < 2.10 also writes v4; newer BLAST+ defaults
# to v5 — pass -blastdb_version 4.
#
# Usage: tools/make_authentic_fixture.sh [outdir]    (default tests/data/authentic)

set -eu
out="${1:-$(dirname "$0")/../tests/data/authentic}"
mkdir -p "$out"
cd "$out"

# Tiny deterministic inputs: a protein set and a nucleotide set with
# ambiguity codes (exercises the 2-bit packing + ambiguity records).
cat > prot.fa <<'EOF'
>ap1 authentic protein one
MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQAPILSRVGDGTQDNLSGAEKAVQVKVKALPDAQ
>ap2 authentic protein two
ARNDCQEGHILKMFPSTWYVBZXARNDCQEGHILKMFPSTWYV
>ap3 authentic protein three
GDGERQFSTLKSTVEAIWAGIKATEAAVSEEFGLAPFLPDQIHFVHSQELLSRYPDLDAKGRERAIAK
>ap4 short
MKTAYIAK
EOF
cat > nucl.fa <<'EOF'
>an1 authentic nucleotide one
ACGTACGTAGCTAGCTAGNNNRYACGTACGTGGGCCCAAATTTACGTACGTAGCTAGCT
>an2 authentic nucleotide two with ambiguity tail
GGGGCCCCAAAATTTTACGTACGTACGTWSKMBDHV
>an3 authentic nucleotide three
TTTTAAAACCCCGGGGTTTTAAAACCCCGGGGACGTACGTACGTACGTACGTACGT
EOF

if command -v formatdb >/dev/null 2>&1; then
    formatdb -i prot.fa -p T -n aprot -t "authentic prot"
    formatdb -i nucl.fa -p F -n anucl -t "authentic nucl"
elif command -v makeblastdb >/dev/null 2>&1; then
    makeblastdb -in prot.fa -dbtype prot -out aprot -title "authentic prot" \
        -blastdb_version 4
    makeblastdb -in nucl.fa -dbtype nucl -out anucl -title "authentic nucl" \
        -blastdb_version 4
else
    echo "ERROR: neither formatdb nor makeblastdb on PATH" >&2
    exit 1
fi
rm -f formatdb.log
echo "authentic fixture written to $out:"
ls -l "$out"
