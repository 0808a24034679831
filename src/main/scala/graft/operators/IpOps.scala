package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IPv4 / CIDR operators for crawl curation — the network-layer
  * sibling of [[PublicSuffix]]: blocklists, bot-ASN filters, and
  * datacenter-range tagging are all "longest-prefix match against a
  * metadata-sized rule table", and the scale shape is the same one
  * the PSL join established: the corpus NEVER shuffles — one
  * broadcast left join per distinct prefix length (<= 33, in practice
  * a handful), a map-side coalesce in descending-length order picks
  * the most specific rule. No UDF anywhere; everything is integer
  * arithmetic on the 32-bit address space.
  */
object IpOps {

  /** Dotted-quad string -> unsigned IPv4 as a Long in [0, 2^32), or
    * NULL for anything malformed (not exactly 4 dot-separated decimal
    * octets, each 0-255, no signs/blanks — `cast` rejects stray
    * characters and `between` rejects range escapes; "01.2.3.4" is
    * accepted as decimal 1, the common parser behavior).
    */
  def ipv4ToLong(ip: Column): Column = {
    val parts = split(ip, "\\.")
    def oct(i: Int): Column = {
      val c = element_at(parts, i).cast("long")
      when(c.isNotNull && c.between(0, 255) &&
        element_at(parts, i).rlike("^[0-9]{1,3}$"), c)
    }
    when(size(parts) === 4,
      oct(1) * 16777216L + oct(2) * 65536L + oct(3) * 256L + oct(4))
  }

  /** Long -> dotted-quad string (the inverse face, for display and
    * round-trip gates). */
  def longToIpv4(ip: Column): Column =
    concat_ws(".",
      ((ip.cast("long") / 16777216L).cast("long") % 256L).cast("string"),
      ((ip.cast("long") / 65536L).cast("long") % 256L).cast("string"),
      ((ip.cast("long") / 256L).cast("long") % 256L).cast("string"),
      (ip.cast("long") % 256L).cast("string"))

  /** One parsed CIDR rule: base address (low end, host bits zeroed),
    * prefix length, opaque verdict label. */
  final case class CidrRule(base: Long, len: Int, verdict: String)

  /** Parse "a.b.c.d/len" (driver-side — rules are configuration, not
    * data). Host bits below the prefix are zeroed. */
  def parseCidr(cidr: String, verdict: String): CidrRule = {
    val Array(addr, lenS) = cidr.split("/")
    val len = lenS.toInt
    require(len >= 0 && len <= 32, s"bad prefix length in $cidr")
    val octs = addr.split("\\.").map(_.toLong)
    require(octs.length == 4 && octs.forall(o => o >= 0 && o <= 255),
      s"bad address in $cidr")
    val raw = octs(0) * 16777216L + octs(1) * 65536L + octs(2) * 256L + octs(3)
    val keep = if (len == 0) 0L else raw >> (32 - len) << (32 - len)
    CidrRule(keep, len, verdict)
  }

  /** Longest-prefix-match join: tag each row's `ipCol` (Long IPv4)
    * with the most specific matching rule's verdict and prefix
    * length; rows matching no rule keep NULLs (left semantics — the
    * caller decides the default).
    *
    * Plan shape: rules group by prefix length into per-length
    * broadcast dims keyed on the rule's prefix VALUE (base >> hostBits
    * — precomputed on the driver; the stream side computes the same
    * `ip div 2^hostBits` per length, a codegen'd integer divide). One
    * broadcast LEFT join per distinct length, then ONE map-side
    * coalesce in descending-length order — most-specific-wins without
    * any explode, groupBy, or corpus shuffle. Duplicate rules at the
    * same (length, prefix) would fan out the stream: rejected eagerly.
    */
  def cidrLookupJoin(df: DataFrame, ipCol: String,
      rules: Seq[CidrRule]): DataFrame = {
    require(rules.nonEmpty, "rules must be non-empty")
    val spark = df.sparkSession
    import spark.implicits._
    val byLen = rules.groupBy(_.len)
    // ADVICE r11: the join key is the MASKED prefix (base >> hostBits),
    // so the guards must hold there — a CidrRule constructed directly
    // with nonzero host bits would alias another rule's prefix and fan
    // out the stream despite a raw-base distinctness check.
    byLen.foreach { case (len, rs) =>
      // ADVICE r12: a directly constructed CidrRule can carry any len;
      // a negative shift count is masked mod 64 by the JVM, so the
      // masked-prefix checks below would pass nonsensically. Validate
      // per length group before shifting.
      require(len >= 0 && len <= 32,
        s"CIDR prefix length out of range: /$len (must be 0..32)")
      val hostBits = 32 - len
      rs.foreach { r =>
        require(r.base >= 0L && r.base < 4294967296L,
          s"rule base out of IPv4 range at /$len: ${r.base}")
        require((r.base >> hostBits) << hostBits == r.base,
          s"rule base has nonzero host bits below /$len: ${r.base} " +
            "(parseCidr zeroes them; direct CidrRule construction must too)")
      }
      val prefixes = rs.map(_.base >> hostBits)
      require(prefixes.distinct.size == prefixes.size,
        s"duplicate rules at /$len (same masked prefix)")
    }
    val lens = byLen.keys.toSeq.sorted(Ordering[Int].reverse)
    val joined = lens.foldLeft(df) { (acc, len) =>
      val hostBits = 32 - len
      val dim = byLen(len)
        .map(r => (r.base >> hostBits, r.verdict))
        .toDF(s"pfx_$len", s"verdict_$len")
      val key =
        if (hostBits == 0) col(ipCol).cast("long")
        else (col(ipCol).cast("long") / (1L << hostBits)).cast("long")
      acc.join(broadcast(dim), key === col(s"pfx_$len"), "left")
        .drop(s"pfx_$len")
    }
    val verdicts = lens.map(l => col(s"verdict_$l"))
    val lenOf = lens.map(l => when(col(s"verdict_$l").isNotNull, lit(l)))
    lens.foldLeft(
      joined
        .withColumn("cidr_verdict", coalesce(verdicts: _*))
        .withColumn("cidr_prefix_len", coalesce(lenOf: _*)))(
      (acc, l) => acc.drop(s"verdict_$l"))
  }
}
