"""Reference-format serialization codecs (SURVEY.md §2.5 item 8):
gnark-crypto point/vk/proof encodings (interop.gnark), snarkjs
zkey/wtns/proof formats (interop.snarkjs)."""
