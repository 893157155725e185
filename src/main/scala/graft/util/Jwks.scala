package graft.util

import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper

/** RS256-over-JWK-Set signature verification, shared by the two auth
  * seams that need it — [[graft.sources.PushReceiver.jwtBearerRs256]]
  * (the fused validator) and `graft.rules.rego.RegoAuth`'s
  * `io.jwt.verify_rs256` builtin (signature-only; the policy pins its
  * own claims). One copy so a hardening fix lands in both.
  *
  * Mirrors the reference's production auth
  * (`/root/reference/docs/rule.md:252-283`): Google-signed push ID
  * tokens verified against a published JWK Set. Every failure path
  * (garbled JWKS, bad key material, malformed token) returns false —
  * never an exception — so callers stay fail-closed.
  */
object Jwks {
  private val mapper = new ObjectMapper

  /** RSA public keys from a JWK Set JSON (`{"keys":[{kty,kid,n,e},…]}`),
    * filtered to `kid` when given. One bad key never rejects the set
    * (JWKS rotation keeps old+new published). */
  def rsaKeys(jwksJson: String, kid: Option[String]): Seq[java.security.PublicKey] =
    try {
      val dec = java.util.Base64.getUrlDecoder
      val kf = java.security.KeyFactory.getInstance("RSA")
      val keys = mapper.readTree(jwksJson).path("keys")
      (0 until keys.size).iterator.map(keys.get)
        .filter(k => k.path("kty").asText() == "RSA")
        .filter(k => kid.forall(_ == k.path("kid").asText()))
        .flatMap { k =>
          try Some(kf.generatePublic(new java.security.spec.RSAPublicKeySpec(
            new java.math.BigInteger(1, dec.decode(k.path("n").asText())),
            new java.math.BigInteger(1, dec.decode(k.path("e").asText())))))
          catch { case _: Exception => None }
        }.toSeq
    } catch { case _: Exception => Nil }

  /** Signature-only RS256 check: header `alg` must be RS256 (`none`/HS*
    * downgrades rejected), then SHA256withRSA over `header.payload`
    * against the JWK matching the header's `kid` — or any RSA key when
    * the token carries none. Claim checks (exp/nbf/iss/email) are the
    * CALLER's job. */
  def signatureValid(token: String, jwksJson: String): Boolean =
    token.split('.') match {
      case Array(h, p, s) =>
        try {
          val dec = java.util.Base64.getUrlDecoder
          val header = mapper.readTree(dec.decode(h))
          val kid = Option(header.path("kid").asText(null)).filter(_.nonEmpty)
          val sigBytes = dec.decode(s)
          val signed = s"$h.$p".getBytes(UTF_8)
          header.path("alg").asText() == "RS256" &&
            rsaKeys(jwksJson, kid).exists { key =>
              // Signature instances are not thread-safe — one per check
              val sig = java.security.Signature.getInstance("SHA256withRSA")
              sig.initVerify(key)
              sig.update(signed)
              try sig.verify(sigBytes) catch { case _: Exception => false }
            }
        } catch { case _: Exception => false }
      case _ => false
    }
}
