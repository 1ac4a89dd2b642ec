"""Deep soak: randomized option-combination parity vs the reference
oracle (the unmodified NCBI C core, oracle/build.py).

Usage:  PYTHONPATH= JAX_PLATFORMS=cpu python tools/soak_fuzz.py [seed] [n]

Every trial draws a task (megablast / blastn / dc-megablast), scoring
pair, gap costs, word size, strand/window/scan-range/ungapped/
perc-identity/searchsp/X-drop/no-greedy/min-raw-score/hitlist knobs,
and 2-5 mutated+reverse-complemented+N-spiked query fragments, then
asserts bit-identical final HSPs (tests.test_oracle_parity.assert_parity).
The CI-pinned sweep (TestRandomComboParity) runs a 12-trial slice of the
same space; this script is the long-haul version (hundreds of trials/h).
"""
import sys, tempfile, pathlib
import numpy as np
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
from tests.test_oracle_parity import (
    assert_parity, rand_seq, revcomp, mutate, to_fasta,
)
from tests.oracle_harness import run_oracle
from gblastn_tpu.stats.tables import UnsupportedScoringError
from gblastn_tpu.params.options import (
    blastn_options, dc_megablast_options, megablast_options,
)

PAIRS = [(1, -5), (1, -4), (2, -7), (1, -3), (2, -5), (1, -2),
         (2, -3), (3, -4), (4, -5), (1, -1), (3, -2), (5, -4)]
# affine gap cost menus the reference validates per pair (gapinfo roughly:
# open >= penalty magnitude constraints); use safe generic menus
GAPS = [(5, 2), (4, 2), (3, 2), (2, 2), (4, 4), (6, 2), (0, 0)]

seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
n_trials = int(sys.argv[2]) if len(sys.argv) > 2 else 200
rng = np.random.default_rng(seed)
g = rand_seq(rng, 45000)
tmp = pathlib.Path(tempfile.mkdtemp())
done = 0
for trial in range(n_trials):
    task = ["megablast", "blastn", "dc-megablast"][int(rng.integers(0, 3))]
    kw = dict(evalue=float(rng.choice([1e-3, 1.0, 10.0])))
    okw = dict(task=task, evalue=kw["evalue"])
    strand = str(rng.choice(["both", "both", "plus", "minus"]))
    if strand != "both":
        kw["strand"] = strand
        okw["strand"] = strand
    window = int(rng.choice([0, 0, 40, 18]))
    if window:
        kw["window_size"] = window
        okw["window_size"] = window
        sr = int(rng.choice([0, 0, 4]))
        if sr:
            kw["off_diagonal_range"] = sr
            okw["scan_range"] = sr
    ung = bool(rng.random() < 0.2) and task != "dc-megablast"
    if ung:
        kw["gapped"] = False
        okw["ungapped"] = True
    if rng.random() < 0.3:
        xd = float(rng.choice([8.0, 15.0, 30.0]))
        kw["x_dropoff_ungapped"] = xd
        okw["xdrop_ungap"] = int(xd)
    if rng.random() < 0.2 and not ung:
        xg = float(rng.choice([12.0, 20.0, 40.0]))
        kw["gap_x_dropoff"] = xg
        okw["xdrop_gap"] = int(xg)
    if rng.random() < 0.2 and not ung:
        xf = float(rng.choice([50.0, 110.0]))
        kw["gap_x_dropoff_final"] = xf
        okw["xdrop_gap_final"] = int(xf)
    if rng.random() < 0.15:
        hs = int(rng.choice([1, 3, 25]))
        kw["hitlist_size"] = hs
        okw["hitlist_size"] = hs
    if rng.random() < 0.15 and not ung:
        mrs = int(rng.choice([40, 80]))
        kw["cutoff_score"] = mrs
        okw["min_raw_gapped_score"] = mrs
    if rng.random() < 0.2:
        kw["searchsp_override"] = int(rng.choice([10**6, 10**8]))
        okw["searchsp"] = kw["searchsp_override"]
    if rng.random() < 0.25:
        pid = float(rng.choice([85.0, 95.0, 99.0]))
        kw["percent_identity"] = pid
        okw["perc_identity"] = pid
    if task == "megablast":
        r, p = PAIRS[int(rng.integers(0, len(PAIRS)))]
        go, ge = GAPS[int(rng.integers(0, len(GAPS)))]
        if (go, ge) == (0, 0) and (r, p) not in (
            (1, -2), (1, -3), (1, -4), (2, -3), (1, -5), (1, -1),
        ):
            go, ge = 5, 2      # linear costs only where the reference
                               # derives greedy defaults cleanly
        w = int(rng.choice([12, 16, 20, 28, 36]))
        try:
            opts = megablast_options(
                reward=r, penalty=p, gap_open=go, gap_extend=ge,
                word_size=w, **kw,
            )
        except ValueError:
            continue
        okw.update(reward=r, penalty=p, gapopen=go, gapextend=ge,
                   word_size=w)
        if (go, ge) == (0, 0):
            okw.pop("gapopen"); okw.pop("gapextend")
        elif rng.random() < 0.2 and not ung:
            # -no_greedy: megablast switches to DP extension
            from gblastn_tpu.params.options import ExtensionMethod
            try:
                opts = opts.replace(
                    extension_method=ExtensionMethod.DYN_PROG,
                    gap_x_dropoff=kw.get("gap_x_dropoff", 30.0),
                )
            except ValueError:
                pass
            else:
                okw["no_greedy"] = True
    elif task == "blastn":
        r, p = PAIRS[int(rng.integers(0, len(PAIRS)))]
        go, ge = GAPS[int(rng.integers(0, len(GAPS) - 1))]  # affine only
        w = int(rng.choice([4, 5, 6, 7, 11, 12, 16]))
        try:
            opts = blastn_options(
                reward=r, penalty=p, gap_open=go, gap_extend=ge,
                word_size=w, **kw,
            )
        except ValueError:
            continue
        okw.update(reward=r, penalty=p, gapopen=go, gapextend=ge,
                   word_size=w)
    else:
        tlen = int(rng.choice([16, 18, 21]))
        tt = ["coding", "optimal", "coding_and_optimal"][
            int(rng.integers(0, 3))]
        try:
            opts = dc_megablast_options(
                template_length=tlen, template_type=tt, **kw,
            )
        except ValueError:
            continue
        okw.update(template_length=tlen, template_type=tt)
    queries = []
    for i in range(int(rng.integers(2, 6))):
        if rng.random() < 0.1:
            ln = int(rng.integers(8, 40))      # shorter than many words
        else:
            ln = int(rng.integers(80, 800))
        start = int(rng.integers(0, len(g) - 1000))
        frag = mutate(rng, g[start:start + ln],
                      sub_rate=float(rng.uniform(0, 0.15)),
                      indel_rate=float(rng.uniform(0, 0.015)))
        if rng.random() < 0.5:
            frag = revcomp(frag)
        if rng.random() < 0.15 and len(frag) > 30:   # plant an N run
            at = int(rng.integers(5, len(frag) - 10))
            frag = frag[:at] + "N" * int(rng.integers(1, 8)) + frag[at:]
        if frag:
            queries.append((f"k{trial}q{i}", frag))
    if not queries:
        continue
    subjects = ([("chr1", g)] if rng.random() < 0.5
                else [("c1", g[:20000]), ("c2", g[20000:])])
    try:
        assert_parity(queries, subjects, opts, okw, tmp)
    except UnsupportedScoringError:
        # the reference rejects this gap-cost/scoring combo too
        try:
            run_oracle(to_fasta(queries), to_fasta(subjects), tmp, **okw)
        except RuntimeError:
            continue
        print(f"FAIL trial {trial} {okw}: we reject, oracle accepts")
        sys.exit(1)
    except AssertionError as e:
        print(f"FAIL trial {trial} {okw}: {str(e)[:600]}")
        sys.exit(1)
    done += 1
    if done % 20 == 0:
        print(f"{done} trials ok (at #{trial})", flush=True)
print(f"soak: {done} trials all parity")
