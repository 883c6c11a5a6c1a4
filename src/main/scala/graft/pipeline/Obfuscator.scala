package graft.pipeline

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Base64

/** PII obfuscation (reference F1: bcrypt with an env salt via
  * nypl-py-utils `obfuscate`, applied at lib/pipeline_controller.py:195-197,
  * 289-291, 359-364). Deterministic keyed hash: equal plaintexts must map
  * to equal ciphertexts across runs, or the warehouse joins (J3/J4/J5)
  * break.
  *
  * The default implementation is salted SHA-256 (pure JVM — this build has
  * no bcrypt dependency); swap in a jBCrypt-backed Obfuscator for byte
  * parity with the reference deployment. Parallelism note: the reference
  * fans obfuscation over a ThreadPoolExecutor; here partition parallelism
  * does the same job with zero extra code.
  */
trait Obfuscator extends Serializable {
  def obfuscate(plaintext: String): String
}

final class Sha256Obfuscator(salt: String) extends Obfuscator {
  override def obfuscate(plaintext: String): String = {
    val md = MessageDigest.getInstance("SHA-256")
    md.update(salt.getBytes(StandardCharsets.UTF_8))
    md.update(plaintext.getBytes(StandardCharsets.UTF_8))
    Base64.getUrlEncoder.withoutPadding.encodeToString(md.digest())
  }
}

/** Test double: fixed plaintext→ciphertext map (mirrors the reference
  * tests' mocked `obfuscate` side_effect lists).
  */
final class MapObfuscator(mapping: Map[String, String]) extends Obfuscator {
  override def obfuscate(plaintext: String): String =
    mapping.getOrElse(plaintext, s"obf($plaintext)")
}
