"""mia CLI: iterative assembler entry point (src/mia_main.c:394-989).

Same flag surface as the reference binary, including the no-space -C<tol>
optional-argument quirk.
"""
from __future__ import annotations

import sys

from ..config import MiaConfig
from ..constants import FLAT_MATCH, FLAT_MISMATCH, N_SCORE, NEANDERTAL_ADAPTER, STANDARD_ADAPTER
from ..core.assembler import run_assembly


def help_text() -> str:
    return (
        "\n\nMIA -- Mapping Iterativ Assembler V 1.0 (TPU-native)\n"
        "       A tool for creating short read assemblies.\n\n"
        "Usage:\n"
        "mia -r <reference sequence>\n"
        "    -f <fasta or fastq file of fragments to align>\n"
        "    -s <substitution matrix file> (if not supplied an default matrix is used)\n"
        "    -m <root file name for maln output file(s)> (assembly.maln.iter)\n"
        "    FILTER parameters:\n"
        "    -u keep one repeat sequence based on alignment score\n"
        "    -U keep one repeat sequence based on sum of q-scores\n"
        "    -C<tolerance> collapse sequences with same start, end, strand\n"
        "    -A aggressive 454 repeat removal\n"
        "    -T trim adapters\n"
        "    -a <adapter sequence or code>\n"
        "    -k <kmer filter length>\n"
        "    -I <file of sequence IDs to use>\n"
        "    ALIGNMENT parameters:\n"
        "    -p <consensus calling code; default = 1>\n"
        "    -c circular reference\n"
        "    -i iterate until convergence (default) / -n do not\n"
        "    -F only output the FINAL assembly\n"
        "    -D distantly related reference\n"
        "    -h homopolymer gap discount\n"
        "    -M lower-case soft-masking of kmers\n"
        "    -H <hard score cutoff>  -S <slope>  -N <intercept>\n"
        f"Default matrix: MATCH={FLAT_MATCH}, MISMATCH={FLAT_MISMATCH}, N={N_SCORE}\n"
    )


def _atoi(s: str) -> int:
    """C atoi: optional sign + leading digits, else 0."""
    s = s.lstrip()
    m = __import__("re").match(r"[+-]?\d+", s)
    return int(m.group(0)) if m else 0


def parse_args(argv: list[str]) -> MiaConfig | None:
    cfg = MiaConfig()
    any_arg = False
    i = 0

    def need_val() -> str:
        nonlocal i
        i += 1
        if i >= len(argv):
            raise SystemExit(help_text())
        return argv[i]

    while i < len(argv):
        arg = argv[i]
        if not arg.startswith("-") or arg == "-":
            print(
                "There seems to be some extra cruff on the command line that mia does not understand.",
                file=sys.stderr,
            )
            raise SystemExit(0)
        flag = arg[1]
        inline = arg[2:]
        if flag == "c":
            cfg.circular = True
        elif flag == "q":
            cfg.make_fastq = True
            cfg.fastq_out_fn = inline or need_val()
            # reference falls through 'q' into 'C' (missing break,
            # src/mia_main.c:482-490): -q also enables collapsing, with
            # tolerance = atoi(filename) (usually 0)
            cfg.collapse = True
            cfg.tolerance = _atoi(cfg.fastq_out_fn)
            print(f"setting collapsing tolerance to {cfg.tolerance}", file=sys.stderr)
        elif flag == "C":
            cfg.collapse = True
            if inline:
                cfg.tolerance = int(inline)
            print(f"setting collapsing tolerance to {cfg.tolerance}", file=sys.stderr)
        elif flag == "n":
            cfg.iterate = False
        elif flag == "i":
            cfg.iterate = True
        elif flag == "h":
            cfg.hp_special = True
        elif flag == "u":
            cfg.repeat_filt = True
        elif flag == "A":
            cfg.just_outer_coords = False
        elif flag == "U":
            cfg.repeat_qual_filt = True
        elif flag == "D":
            cfg.distant_ref = True
        elif flag == "p":
            cfg.cons_code = int(inline or need_val())
            any_arg = True
        elif flag == "I":
            cfg.ids_file = inline or need_val()
        elif flag == "H":
            cfg.hard_cut = int(inline or need_val())
            if cfg.hard_cut <= 0:
                print("Hard cutoff (-H) must be positive", file=sys.stderr)
                print(help_text())
                raise SystemExit(0)
            any_arg = True
        elif flag == "M":
            cfg.soft_mask = True
        elif flag == "s":
            cfg.submat_fn = inline or need_val()
            any_arg = True
        elif flag == "r":
            cfg.ref_fn = inline or need_val()
            any_arg = True
        elif flag == "k":
            cfg.kmer_filt_len = int(inline or need_val())
            any_arg = True
        elif flag == "f":
            cfg.frag_fn = inline or need_val()
            any_arg = True
        elif flag == "m":
            cfg.maln_root = inline or need_val()
            any_arg = True
        elif flag == "T":
            cfg.do_adapter_trimming = True
        elif flag == "a":
            val = inline or need_val()
            if len(val) > 127:
                print(
                    "That adapter is too big!\nMIA will use the standard adapter.",
                    file=sys.stderr,
                )
                cfg.adapter = STANDARD_ADAPTER
            elif len(val) > 1:
                cfg.adapter = val
            elif val and val[0] in "nN":
                cfg.adapter = NEANDERTAL_ADAPTER
            else:
                cfg.adapter = STANDARD_ADAPTER
        elif flag == "S":
            cfg.slope = float(inline or need_val())
            cfg.score_cut_set = True
        elif flag == "N":
            cfg.intercept = float(inline or need_val())
            cfg.score_cut_set = True
        elif flag == "F":
            cfg.final_only = True
        elif flag == "-" and arg == "--engine":
            cfg.engine = need_val()
        else:
            print(help_text())
            raise SystemExit(0)
        i += 1

    if not any_arg:
        print(help_text())
        raise SystemExit(0)
    return cfg


def main(argv: list[str] | None = None) -> int:
    import time

    argv = sys.argv[1:] if argv is None else argv
    cfg = parse_args(argv)
    print(
        f"Starting assembly of {cfg.frag_fn}\nusing {cfg.ref_fn}\n"
        f"as reference at {time.asctime()}\n",
        file=sys.stderr,
    )
    run_assembly(cfg)
    print(f"Assembly finished at {time.asctime()}\n", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
