"""Reference-format serialization codecs (SURVEY.md §2.5 item 8):
gnark-crypto point/vk/proof encodings (interop.gnark), gnark v0.14 R1CS
binaries + witness solving (interop.gnark_r1cs, with interop.cbor and
interop.intcomp as its decoders), and snarkjs zkey/wtns/vkey formats
(interop.snarkjs)."""
