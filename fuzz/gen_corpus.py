"""Seed-corpus generator for the libFuzzer harnesses.

Fills the role of the reference's Go generator (reference
fuzz/gen_corpus/main.go:16-196, which seeds corpora with inputs the
*original* c-kzg-4844 implementation accepts — a cross-implementation
oracle). Two sources here:

  * the bundled consensus-spec vectors (testdata/consensus): every
    vector input IS a c-kzg-produced byte string — lifted verbatim into
    the matching target's corpus (mainnet 4096-element sizes);
  * fresh valid inputs generated through THIS library at the fuzz
    harness's small setup size (testdata/trusted_setup_4.txt, 4-element
    blobs — the size the `make fuzz_<fn>` targets gate on), with
    canonical scalars forced by zeroing the top byte (the same trick as
    reference main.go:16-29 zeroing the last BE byte).

Writes testdata/corpus/<fn>/NNN.bin (+ the combined harness's
first-byte-prefixed copies under testdata/corpus/combined/).

Usage: python fuzz/gen_corpus.py [--out DIR] [--count N] [--seed S]
"""

import argparse
import glob
import hashlib
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.join(os.path.dirname(__file__), "..")
VECTORS = os.path.join(REPO, "testdata", "consensus")
SETUP4 = os.path.join(REPO, "testdata", "trusted_setup_4.txt")

FNS = [
    "blob_to_kzg_commitment",
    "compute_kzg_proof",
    "compute_blob_kzg_proof",
    "verify_kzg_proof",
    "verify_blob_kzg_proof",
    "verify_blob_kzg_proof_batch",
]


def _hx(s):
    return bytes.fromhex(s[2:])


def _vector_input_bytes(fn, inp):
    """Concatenate a vector's input map into the harness's wire layout."""
    if fn == "blob_to_kzg_commitment":
        return _hx(inp["blob"])
    if fn == "compute_kzg_proof":
        return _hx(inp["blob"]) + _hx(inp["z"])
    if fn == "compute_blob_kzg_proof":
        return _hx(inp["blob"]) + _hx(inp["commitment"])
    if fn == "verify_kzg_proof":
        return (
            _hx(inp["commitment"]) + _hx(inp["z"]) + _hx(inp["y"]) + _hx(inp["proof"])
        )
    if fn == "verify_blob_kzg_proof":
        return _hx(inp["blob"]) + _hx(inp["commitment"]) + _hx(inp["proof"])
    if fn == "verify_blob_kzg_proof_batch":
        return (
            b"".join(_hx(b) for b in inp["blobs"])
            + b"".join(_hx(c) for c in inp["commitments"])
            + b"".join(_hx(p) for p in inp["proofs"])
        )
    raise AssertionError(fn)


def corpus_from_vectors(out_dir):
    import yaml

    n = 0
    for fn in FNS:
        tgt = os.path.join(out_dir, fn)
        os.makedirs(tgt, exist_ok=True)
        for path in sorted(
            glob.glob(os.path.join(VECTORS, fn, "small", "*", "data.yaml"))
        ):
            with open(path) as f:
                data = yaml.safe_load(f)
            try:
                raw = _vector_input_bytes(fn, data["input"])
            except (KeyError, ValueError):
                continue  # malformed-on-purpose vectors that don't parse as hex
            name = hashlib.sha256(raw).hexdigest()[:16]
            with open(os.path.join(tgt, f"vec_{name}.bin"), "wb") as f:
                f.write(raw)
            n += 1
    return n


def corpus_from_library(out_dir, count, seed):
    """Fresh valid inputs at the fuzz setup size (4-element blobs)."""
    from lambdaworks_kzg_tpu import EIP4844Context, load_trusted_setup_file
    from lambdaworks_kzg_tpu.models.kzg import HostBackend

    setup = load_trusted_setup_file(SETUP4)
    ctx = EIP4844Context(setup, backend=HostBackend(setup))
    rng = random.Random(seed)
    n_field = setup.n

    def blob():
        return b"".join(
            rng.randrange(2**248).to_bytes(31, "little") + b"\x00"
            for _ in range(n_field)
        )

    def fr():
        from lambdaworks_kzg_tpu.utils.hashing import bls_field_to_bytes

        return bls_field_to_bytes(rng.randrange(2**248))

    def emit(fn, raw):
        tgt = os.path.join(out_dir, fn)
        os.makedirs(tgt, exist_ok=True)
        name = hashlib.sha256(raw).hexdigest()[:16]
        with open(os.path.join(tgt, f"gen_{name}.bin"), "wb") as f:
            f.write(raw)

    for _ in range(count):
        b = blob()
        c = ctx.blob_to_kzg_commitment(b)
        z = fr()
        proof, y = ctx.compute_kzg_proof(b, z)
        bproof = ctx.compute_blob_kzg_proof(b, c)
        emit("blob_to_kzg_commitment", b)
        emit("compute_kzg_proof", b + z)
        emit("compute_blob_kzg_proof", b + c)
        emit("verify_kzg_proof", c + z + y + proof)
        emit("verify_blob_kzg_proof", b + c + bproof)
        batch = [(blob(),) for _ in range(3)]
        blobs = [t[0] for t in batch]
        cs = [ctx.blob_to_kzg_commitment(x) for x in blobs]
        ps = [ctx.compute_blob_kzg_proof(x, cc) for x, cc in zip(blobs, cs)]
        emit(
            "verify_blob_kzg_proof_batch",
            b"".join(blobs) + b"".join(cs) + b"".join(ps),
        )
    return count


def combined_corpus(out_dir):
    """Prefix every per-target seed with its dispatch byte for the
    combined first-byte harness."""
    tgt = os.path.join(out_dir, "combined")
    os.makedirs(tgt, exist_ok=True)
    n = 0
    for i, fn in enumerate(FNS):
        for path in glob.glob(os.path.join(out_dir, fn, "*.bin")):
            raw = bytes([i]) + open(path, "rb").read()
            name = hashlib.sha256(raw).hexdigest()[:16]
            with open(os.path.join(tgt, f"{name}.bin"), "wb") as f:
                f.write(raw)
            n += 1
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "testdata", "corpus"))
    ap.add_argument("--count", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    nv = corpus_from_vectors(args.out)
    ng = corpus_from_library(args.out, args.count, args.seed)
    nc = combined_corpus(args.out)
    print(f"corpus: {nv} vector seeds + {ng} generated rounds "
          f"({nc} combined copies) -> {args.out}")


if __name__ == "__main__":
    main()
