"""Protocol and curve constants for the TPU-native KZG / EIP-4844 framework.

Capability parity targets (reference: lambdaclass/lambdaworks_kzg):
  - sizes/domains: reference src/lib.rs:59-98
  - Fiat-Shamir domains: reference src/lib.rs:60-62
The numeric curve constants are the public BLS12-381 parameters.

NOTE on semantics: the consensus-spec test vectors shipped with the reference
(tests/<fn>/small/*/data.yaml) follow the *original* EIP-4844 spec era:
  - field elements serialized LITTLE-endian (32 bytes, canonical < r)
  - blobs are polynomial *evaluations* over the bit-reversed roots-of-unity
    domain (the trusted-setup G1 powers are monomial in the file and must be
    converted with an inverse group-FFT + bit-reversal permutation, exactly
    the pipeline left commented out in reference src/lib.rs:760-770).
The reference library itself deviates (coefficient-form blobs, big-endian);
we implement the spec semantics so the vectors pass bit-exactly.
"""

# ---------------------------------------------------------------------------
# Sizes (reference src/lib.rs:70-92)
# ---------------------------------------------------------------------------
FIELD_ELEMENTS_PER_BLOB = 4096
BYTES_PER_FIELD_ELEMENT = 32
BYTES_PER_BLOB = FIELD_ELEMENTS_PER_BLOB * BYTES_PER_FIELD_ELEMENT  # 131072
BYTES_PER_COMMITMENT = 48
BYTES_PER_PROOF = 48
NUM_G2_POINTS = 65
TRUSTED_SETUP_NUM_G1_POINTS = FIELD_ELEMENTS_PER_BLOB

# ---------------------------------------------------------------------------
# Fiat-Shamir domain separators (reference src/lib.rs:60-62)
# ---------------------------------------------------------------------------
FIAT_SHAMIR_PROTOCOL_DOMAIN = b"FSBLOBVERIFY_V1_"
RANDOM_CHALLENGE_KZG_BATCH_DOMAIN = b"RCKZGBATCH___V1_"

# ---------------------------------------------------------------------------
# BLS12-381 parameters (public constants)
# ---------------------------------------------------------------------------
# Base field prime (381 bits)
P = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
# Scalar field prime r (255 bits) == BLS_MODULUS in the consensus spec
R = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
BLS_MODULUS = R

# Curve: y^2 = x^3 + 4 over Fp;  twist E'/Fp2: y^2 = x^3 + 4(u+1)
B_G1 = 4
B_G2 = (4, 4)  # 4*(u+1) = 4 + 4u as (c0, c1)

# BLS parameter x (the curve is parameterized by x; x < 0 for BLS12-381)
BLS_X = -0xD201000000010000

# GLV endomorphism sigma(x, y) = (BETA*x, y): the cube root of unity in Fp
# that acts as multiplication by -BLS_X^2 on G1. Fast subgroup check
# (Scott, "A note on group membership tests...", the check blst ships):
#   P on curve is in G1  <=>  sigma(P) == -[BLS_X^2]P
# i.e. two 64-bit scalar muls instead of the definitional 255-bit [r]P
# (reference src/compression.rs:22-27). Validated against the definitional
# oracle in tests/test_curve.py / test_g1_batch.py, including h-torsion
# points and the consensus not_in_G1 vectors.
G1_BETA = 0x5F19672FDF76CE51BA69C6076A0F77EADDB3A93BE6F89688DE17D813620A00022E01FFFFFFFEFFFE

# G2 untwist-Frobenius-twist endomorphism psi(x, y) = (PSI_X*conj(x),
# PSI_Y*conj(y)) (conj = Fp2 conjugation), acting as multiplication by
# BLS_X on G2. Fast subgroup check (same Scott note / blst):
#   Q on twist is in G2  <=>  psi(Q) == -[|BLS_X|]Q
# Constants derived from [BLS_X]G2 / conj(G2) and validated as an
# endomorphism + against the definitional oracle in tests/test_curve.py.
PSI_X = (
    0x0,
    0x1A0111EA397FE699EC02408663D4DE85AA0D857D89759AD4897D29650FB85F9B409427EB4F49FFFD8BFD00000000AAAD,
)
PSI_Y = (
    0x135203E60180A68EE2E9C448D77A2CD91C3DEDD930B1CF60EF396489F61EB45E304466CF3E67FA0AF1EE7B04121BDEA2,
    0x06AF0E0437FF400B6831E36D6BD17FFE48395DABC2D3435E77F76E17009241C5EE67992F72EC05F4C81084FBEDE3CC09,
)

# G1 generator (affine)
G1_GENERATOR_X = 0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB
G1_GENERATOR_Y = 0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1

# G2 generator (affine, Fp2 coords as (c0, c1))
G2_GENERATOR_X = (
    0x024AA2B2F08F0A91260805272DC51051C6E47AD4FA403B02B4510B647AE3D1770BAC0326A805BBEFD48056C8C121BDB8,
    0x13E02B6052719F607DACD3A088274F65596BD0D09920B61AB5DA61BBDC7F5049334CF11213945D57E5AC7D055D042B7E,
)
G2_GENERATOR_Y = (
    0x0CE5D527727D6E118CC9CDC6DA2E351AADFD9BAA8CBDD3A76D429A695160D12C923AC9CC3BACA289E193548608B82801,
    0x0606C4A02EA734CC32ACD2B02BC28B99CB3E287E85A763AF267492AB572E99AB3F370D275CEC1DA1AAA9075FF05F79BE,
)

# Primitive root of unity for the Fr multiplicative group (consensus spec)
PRIMITIVE_ROOT_OF_UNITY = 7
# 2-adicity of r - 1
FR_TWO_ADICITY = 32

# ---------------------------------------------------------------------------
# Status codes, mirroring the reference C ABI enum (reference src/lib.rs:45-57)
# ---------------------------------------------------------------------------
C_KZG_OK = 0
C_KZG_BADARGS = 1
C_KZG_ERROR = 2
C_KZG_MALLOC = 3


def fr_root_of_unity(order: int) -> int:
    """Primitive `order`-th root of unity in Fr (order must divide 2^32)."""
    assert order & (order - 1) == 0 and order <= (1 << FR_TWO_ADICITY)
    return pow(PRIMITIVE_ROOT_OF_UNITY, (R - 1) // order, R)
