"""BLS12-381 curve parameters.

The reference (camlspotter/zukelang) obtains these from the external `bls12-381`
opam package (blst C library), pinned in /root/reference/dune-project:23.  Here
they are first-class constants shared by the golden (python-int) backend and
the TPU (JAX limb-array) backend.

Encodings follow the ZCash BLS12-381 spec, matching blst's
`to_compressed_bytes` used for JSON in /root/reference/src/lib/zk/curve.ml:199-210.
"""

# Base field modulus (Fq)
P = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB

# Scalar field modulus (Fr) — the order of G1/G2/GT
R = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001

# BLS parameter x (negative): the curve is parameterized by z = -0xd201000000010000
BLS_X = 0xD201000000010000
BLS_X_IS_NEG = True

# Curve equations: E/Fq : y^2 = x^3 + 4 ; E'/Fq2 : y^2 = x^3 + 4(u+1)
B_G1 = 4
B_G2 = (4, 4)  # 4 + 4u in Fq2 coefficients (c0, c1)

# Generators (from the IETF/ZCash standard, identical to blst's)
G1_GEN_X = 0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB
G1_GEN_Y = 0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1

G2_GEN_X = (
    0x024AA2B2F08F0A91260805272DC51051C6E47AD4FA403B02B4510B647AE3D1770BAC0326A805BBEFD48056C8C121BDB8,  # c0
    0x13E02B6052719F607DACD3A088274F65596BD0D09920B61AB5DA61BBDC7F5049334CF11213945D57E5AC7D055D042B7E,  # c1
)
G2_GEN_Y = (
    0x0CE5D527727D6E118CC9CDC6DA2E351AADFD9BAA8CBDD3A76D429A695160D12C923AC9CC3BACA289E193548608B82801,  # c0
    0x0606C4A02EA734CC32ACD2B02BC28B99CB3E287E85A763AF267492AB572E99AB3F370D275CEC1DA1AAA9075FF05F79BE,  # c1
)

# 2-adicity of Fr: #Fr - 1 = 2^32 * FR_ODD  (reference: src/lib/zk/FFT.ml:192-204)
FR_TWO_ADICITY = 32
FR_ODD = (R - 1) >> 32
assert (R - 1) == FR_ODD << 32 and FR_ODD % 2 == 1

# Multiplicative generator of Fr* used by the reference to derive the
# 2^32-th primitive root of unity omega = g^FR_ODD (src/lib/zk/FFT.ml:209-219).
FR_GENERATOR = 5
# Primitive 2^32-th root of unity in Fr (omega^(2^32) = 1, omega^(2^31) != 1).
FR_ROOT_OF_UNITY = pow(FR_GENERATOR, FR_ODD, R)
assert pow(FR_ROOT_OF_UNITY, 1 << 31, R) != 1
assert pow(FR_ROOT_OF_UNITY, 1 << 32, R) == 1

# --- Limb layouts for the TPU backend -------------------------------------
# TPU has no 64-bit integer multiply; 16-bit limbs held in uint32 lanes keep
# every partial product and CIOS accumulation step below 2^32 exactly.
LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1
FR_LIMBS = 16   # 256 bits >= 255-bit r
FQ_LIMBS = 24   # 384 bits >= 381-bit p

# Montgomery parameters (R_mont = 2^(LIMB_BITS * n_limbs))
FR_MONT_R = 1 << (LIMB_BITS * FR_LIMBS)
FQ_MONT_R = 1 << (LIMB_BITS * FQ_LIMBS)
# -p^{-1} mod 2^LIMB_BITS for the per-limb CIOS reduction step
FR_NPRIME = (-pow(R, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
FQ_NPRIME = (-pow(P, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
