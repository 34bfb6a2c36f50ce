import secrets, time
from lambdaworks_kzg_tpu import load_trusted_setup_file, EIP4844Context, FIELD_ELEMENTS_PER_BLOB, KZGError
t0=time.time()
setup = load_trusted_setup_file("/root/repo/testdata/trusted_setup.txt")
print("setup", f"{time.time()-t0:.1f}s", flush=True)
ctx = EIP4844Context(setup)
blob = b"".join(secrets.token_bytes(31) + b"\x00" for _ in range(FIELD_ELEMENTS_PER_BLOB))
t0=time.time()
c = ctx.blob_to_kzg_commitment(blob)
print("commit(first)", f"{time.time()-t0:.1f}s", flush=True)
t0=time.time()
c = ctx.blob_to_kzg_commitment(blob)
print("commit(warm)", f"{time.time()-t0:.3f}s", flush=True)
p = ctx.compute_blob_kzg_proof(blob, c)
assert ctx.verify_blob_kzg_proof(blob, c, p)
print("roundtrip OK", flush=True)
for bad in (b"\xff"*32*FIELD_ELEMENTS_PER_BLOB, blob[:-1]):
    try: ctx.blob_to_kzg_commitment(bad); print("FAIL: accepted bad blob")
    except KZGError: pass
try: ctx.verify_blob_kzg_proof(blob, b"\x12"*48, p); print("FAIL: accepted garbage commitment")
except KZGError: pass
assert ctx.verify_blob_kzg_proof_batch([], [], []) is True
print("rejection probes OK; backend:", type(ctx.kzg.backend).__name__, flush=True)
