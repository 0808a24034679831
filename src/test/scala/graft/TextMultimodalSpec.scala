package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, TextOps}

class TextMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("tokens/quality: empty-safe counts and ratios") {
    val df = Seq(
      "the quick brown fox, it is on the mat!",
      "  padded   whitespace   here  ").toDF("text")
    val got = df.select(
      TextOps.tokenCount($"text").as("n"),
      TextOps.qualityScore($"text").as("q")).collect()
    assert(got(0).getInt(0) == 9)
    assert(got(1).getInt(0) == 3)
    assert(got.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
  }

  test("bpeishTokenCount: hand-computed segmentation — contractions, " +
      "digits, punctuation runs, and whitespace split like a BPE " +
      "pre-tokenizer, not like whitespace words") {
    val df = Seq(
      // don|'t| stop| at| 3| items|!!| —| it|'s| $|4|.|50| ok = 15
      "don't stop at 3 items!! — it's $4.50 ok",
      "word",
      "  doubled  spaces  ").toDF("text")
    val got = df.select(
      TextOps.bpeishTokenCount($"text").as("b"),
      TextOps.tokenCount($"text").as("w")).collect()
    assert(got(0).getInt(0) == 15, got(0))
    assert(got(0).getInt(1) == 9) // whitespace sees only 9 "words"
    assert(got(1).getInt(0) == 1 && got(1).getInt(1) == 1)
    // "  " + doubled + "  " + spaces + "  " = 5 segments (the single
    // space before a word rides the word segment; runs stand alone)
    assert(got(2).getInt(0) == 5, got(2))
  }

  test("bpePairCounts: vocab-weighted adjacent pairs, repeats counted, " +
      "1-char words excluded") {
    // "aaa" x2 -> pair aa twice per occurrence = 4; "ab" x3 -> ab 3;
    // "a" x5 -> no pairs (and must not trip sequence(0,-1))
    val df = Seq("aaa ab a a", "aaa ab ab a a a").toDF("text")
    val got = TextOps.bpePairCounts(df, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("aa" -> 4L, "ab" -> 3L))
  }

  test("bpeTrain learns the textbook merge sequence on Sennrich's " +
      "corpus (deterministic argmax, greedy left-to-right apply)") {
    // low x5, lower x2, newest x6, widest x3: round-1 pair counts put
    // (e,s) and (s,t) tied at 9 -> tie-break picks (e,s); round 2
    // merges (es,t) at 9; round 3 has (l,o) and (o,w) tied at 7 ->
    // (l,o). Hand-derivable end to end.
    val corpus = Seq(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
      .toDF("text")
    val got = TextOps.bpeTrain(corpus, "text", 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toList.sortBy(_._1)
    assert(got == List((1, "e", "s", 9L), (2, "es", "t", 9L),
      (3, "l", "o", 7L)))
    // greedy overlap: "aaaa" merges (a,a) at positions 0 and 2 only,
    // so round 2 sees [aa, aa] and learns (aa, aa)
    val rep = Seq("aaaa aaaa aaaa").toDF("text")
    val reps = TextOps.bpeTrain(rep, "text", 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toList.sortBy(_._1)
    assert(reps == List((1, "a", "a", 9L), (2, "aa", "aa", 3L)))
  }

  test("bpeEncode applies merges in order; fertility is exact micros") {
    // merges (a,b) then (ab,c): "abc" -> [abc] (1); "cab" -> [c, ab]
    // (2); "abab" -> [ab, ab] (2); "xyz" untouched -> 3 subtokens
    val docs = Seq((1L, "abc cab"), (2L, "abab xyz")).toDF("id", "text")
    val out = TextOps.bpeEncode(docs, "id", "text",
        Seq(("a", "b"), ("ab", "c")))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L) === ((2L, 3L, 1500000L)))
    assert(out(2L) === ((2L, 5L, 2500000L)))
    // encode(vocab(train)) degenerates to the trainer's own merged
    // vocab: a word made ONLY of learned merges collapses fully
    val corpus = Seq((1L, "ab ab ab")).toDF("id", "text")
    val enc = TextOps.bpeEncode(corpus, "id", "text", Seq(("a", "b")))
      .collect().head
    assert(enc.getLong(2) === 3L) // 3 words x 1 subtoken
  }

  test("canonicalizeUrl: per-rule edge cases — wrong-scheme ports " +
      "kept, root slash kept, param sort, tracking-only query " +
      "vanishes, path case preserved") {
    import graft.operators.UrlOps
    val cases = Seq(
      // scheme-mismatched ports are NOT default: keep them
      ("http://x.com:443/a", "http://x.com:443/a"),
      ("https://x.com:80/a", "https://x.com:80/a"),
      // root path: the lone slash survives (only non-root trims)
      ("https://x.com/", "https://x.com/"),
      // params sort; empties drop; '&&' tolerated
      ("https://x.com/p?z=2&&a=1", "https://x.com/p?a=1&z=2"),
      // tracking-only query vanishes entirely (no dangling '?')
      ("https://x.com/p?utm_campaign=c&gclid=g", "https://x.com/p"),
      // path/query case preserved; only scheme+host lowercase
      ("HTTPS://X.COM/CaseSensitive?Q=V", "https://x.com/CaseSensitive?Q=V"),
      // fragment-only suffix
      ("https://x.com/p#sec", "https://x.com/p"),
      // www + port + everything at once
      ("HTTP://WWW.X.COM:80/d/?b=2&a=1&utm_source=s#f", "http://x.com/d?a=1&b=2"))
    val df = cases.toDF("url", "expected")
    val got = df.select(UrlOps.canonicalizeUrl($"url").as("c"), $"expected")
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r))
    val hosts = Seq("https://WWW.Site.Com:8443/x", "http://a.b.co/p?q=1")
      .toDF("url").select(UrlOps.host($"url")).collect().map(_.getString(0))
    assert(hosts.toSeq == Seq("site.com", "a.b.co"))
  }

  test("percentNormalize: RFC 3986 6.2.2 — unreserved escapes decode, " +
      "reserved escapes uppercase, malformed escapes untouched") {
    import graft.operators.UrlOps
    val cases = Seq(
      // unreserved: ALPHA / DIGIT / - . _ ~ decode
      ("https://x.com/%41%62%30%2d%2E%5f%7e", "https://x.com/Ab0-._~"),
      // reserved stays escaped, hex uppercased
      ("https://x.com/a%2fb%3Dc%3a", "https://x.com/a%2Fb%3Dc%3A"),
      // malformed: bad hex, short tail, trailing %, %% run
      ("https://x.com/%zz%4", "https://x.com/%zz%4"),
      ("https://x.com/t%", "https://x.com/t%"),
      ("https://x.com/d%%41", "https://x.com/d%A"),
      // no escapes: byte-identical passthrough
      ("https://x.com/plain?a=1", "https://x.com/plain?a=1"),
      // escape at string start after split edge
      ("%41https://x.com", "Ahttps://x.com"))
    val got = cases.toDF("url", "expected")
      .select(UrlOps.percentNormalize($"url").as("n"), $"expected")
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r))
  }

  test("langId picks profile language; 'und' when no markers") {
    val df = Seq(
      "the cat and the dog of the house is big",
      "der hund und die katze das ist gut",
      "le chat et la maison les arbres est grand",
      "xyzzy qwerty plugh").toDF("text")
    val got = df.select(TextOps.langId($"text")).collect().map(_.getString(0))
    assert(got.toSeq == Seq("en", "de", "fr", "und"))
  }

  test("fingerprint: order-sensitive, deterministic") {
    val df = Seq("ab c", "c ab", "ab c").toDF("text")
    val got = df.select(TextOps.fingerprint($"text")).collect().map(_.getLong(0))
    assert(got(0) == got(2))
    assert(got(0) != got(1)) // rolling hash is order-sensitive
  }

  test("native langId == HOF langId on real documents and edge strings") {
    val diff = Tables.documents(spark, Sf0001)
      .select(TextOps.langId($"text").as("hof"),
        graft.expressions.LangId($"text").as("native"))
      .filter($"hof" =!= $"native").count()
    assert(diff == 0L)
    val edge = Seq("", "   ", "xyzzy", "the der le el de the der")
      .toDF("text")
      .select(TextOps.langId($"text").as("hof"),
        graft.expressions.LangId($"text").as("native"))
      .collect()
    assert(edge.forall(r => r.getString(0) == r.getString(1)), edge.toSeq)
  }

  test("native quality struct == HOF features on real documents") {
    val q = graft.expressions.TextQuality($"text")
    val hof = TextOps.qualityFeatures($"text").toMap
    val diff = Tables.documents(spark, Sf0001)
      .select(
        q.getField("n_tokens").as("nt"), hof("n_tokens").as("nt2"),
        q.getField("mean_token_len").as("m"), hof("mean_token_len").as("m2"),
        q.getField("stopword_ratio").as("s"), hof("stopword_ratio").as("s2"),
        q.getField("punct_ratio").as("p"), hof("punct_ratio").as("p2"))
      .filter($"nt" =!= $"nt2" || $"m" =!= $"m2" ||
        $"s" =!= $"s2" || $"p" =!= $"p2")
      .count()
    assert(diff == 0L)
  }

  test("native tokenizer matches the ASCII \\s+ SQL contract on Unicode ws") {
    // U+2000 EN QUAD, U+2028 LINE SEP, U+00A0 NBSP: the regex \s in
    // Java/RE2 splits on NONE of these, so the native tokenizer must
    // not either (Character.isWhitespace splits the first two — the
    // divergence this pins down). Token counts and repetition
    // fractions must agree with the split('\\s+') HOF path per row.
    val docs = Seq(
      "a\u2000b c", "x\u2028y z", "n\u00A0b\u00A0sp d",
      "mixed ws\ttabs and\nnewlines", "plain ascii only here")
      .toDF("text")
    val q = graft.expressions.TextQuality($"text")
    val r = graft.expressions.TextRepetition($"text")
    val bad = docs.select(
      q.getField("n_tokens").as("nt"), TextOps.tokenCount($"text").as("nt2"),
      r.getField("n_2grams").as("g"),
      (size(TextOps.shinglesAll($"text", 2)) *
        when(size(TextOps.tokens($"text")) >= 2, 1).otherwise(0)).as("g2"))
      .filter($"nt" =!= $"nt2" || $"g" =!= $"g2")
      .count()
    assert(bad == 0L)
  }

  test("native fingerprint == HOF fingerprint on real documents") {
    val diff = Tables.documents(spark, Sf0001)
      .select(
        TextOps.fingerprint($"text").as("hof"),
        graft.expressions.TextFingerprint($"text").as("native"))
      .filter($"hof" =!= $"native").count()
    assert(diff == 0L)
  }

  test("native shingle hashes == HOF poly fold on real documents") {
    val df = Tables.documents(spark, Sf0001)
      .select($"text").union(Seq("", "one", "a b", "x  y\tz\n").toDF("text"))
    val diff = df.select(
      graft.expressions.TextShingleHashes($"text", 3).as("native"),
      TextOps.shingleHashesHof($"text", 3).as("hof"))
      .filter(!($"native" <=> $"hof")).count()
    assert(diff == 0L)
  }

  test("native 60-bit span hashes == HOF strict-span combined60 on real " +
      "documents and edge strings") {
    val df = Tables.documents(spark, Sf0001)
      .select($"text").union(Seq("", "one", "a b c", "x  y\tz\n w q r s t u")
        .toDF("text"))
    val hofSpans = graft.functions.ColumnOps.bind(TextOps.tokens($"text")) {
      toks =>
        when(size(toks) >= 4,
          transform(sequence(lit(0), size(toks) - 4),
            i => concat_ws("", slice(toks, i + lit(1), lit(4)))))
          .otherwise(array().cast("array<string>"))
    }
    val diff = df.select(
      graft.expressions.TextSpanHashes60($"text", 4).as("native"),
      transform(hofSpans, s => TextOps.combined60Hof(s)).as("hof"))
      .filter(!($"native" <=> $"hof")).count()
    assert(diff == 0L)
  }

  test("native simhash == HOF simhash on real documents and edge strings") {
    val df = Tables.documents(spark, Sf0001)
      .select($"text").union(Seq("", "one", "der die und das ist").toDF("text"))
    val diff = df.select(
      graft.expressions.TextSimHash($"text").as("native"),
      TextOps.simhashHof($"text").as("hof"))
      .filter(!($"native" <=> $"hof")).count()
    assert(diff == 0L)
  }

  test("native winnow == HOF winnow; fingerprints stable under repeat") {
    val df = Tables.documents(spark, Sf0001).select($"text")
    val diff = df.select(
      TextOps.winnowingFingerprints($"text").as("native"),
      TextOps.winnowingFingerprintsHof($"text").as("hof"))
      .filter(!($"native" <=> $"hof")).count()
    assert(diff == 0L)
  }

  test("minhash over native shingle hashes == minhash over HOF hashes") {
    import graft.expressions.{MinHashSig, TextShingleHashes}
    val df = Tables.documents(spark, Sf0001).select($"text")
    val diff = df.select(
      MinHashSig.ofHashes(TextShingleHashes($"text", 3), 64).as("native"),
      MinHashSig.ofHashes(TextOps.shingleHashesHof($"text", 3), 64).as("hof"))
      .filter(!($"native" <=> $"hof")).count()
    assert(diff == 0L)
  }

  test("shingles: n-grams with short-text fallback") {
    val df = Seq("a b c d", "a b").toDF("text")
    val got = df.select(TextOps.shingles($"text", 3)).collect()
      .map(_.getSeq[Any](0).map(_.toString).toSet)
    assert(got(0) == Set("abc", "bcd"))
    assert(got(1) == Set("ab")) // shorter than n -> whole text
  }

  test("tfidf: corpus-wide terms score low, salient terms rank first") {
    import graft.operators.TfIdf
    // "the" appears in all 4 docs (df=4 -> idf = ln(5/5)+1 = 1);
    // "rust" only in doc 0 (df=1 -> idf = ln(5/2)+1 ≈ 1.916)
    val docs = Seq(
      (0L, "the rust compiler the borrow checker"),
      (1L, "the cat sat"),
      (2L, "the dog ran"),
      (3L, "the end")).toDF("doc_id", "text")
    val top = TfIdf.topTerms(docs, "doc_id", "text", 2)
      .filter($"id" === 0L).orderBy("rank").collect()
    // doc 0: tf(the)=2 * idf 1.0 = 2.0; tf(rust)=1 * 1.916 = 1.916 —
    // "the" still wins on tf, then the salient terms follow
    assert(top.length == 2)
    assert(top(0).getAs[String]("term") == "the")
    assert(Set("borrow", "checker", "compiler", "rust")
      .contains(top(1).getAs[String]("term")))
    // idf of a term present in every doc is exactly 1.0
    val idf = TfIdf.idfTable(
      TfIdf.termFreq(docs, "doc_id", "text"), docs)
      .filter($"term" === "the").first()
    assert(idf.getAs[Long]("df") == 4L)
    assert(idf.getAs[Double]("idf") == 1.0)
  }

  test("unigramLogProb: out-of-distribution docs score lowest; " +
      "bm25 ranks the salient term above the ubiquitous one") {
    import graft.operators.TfIdf
    val docs = (Seq(
      (0L, "the cat sat on the mat near the door"),
      (1L, "the dog ran to the door and sat down"),
      (2L, "zzqx vvkw pplr mmnt bbcd qqrs wwty kkjh")) ++ // singleton junk
      (3L to 8L).map(i => (i, "the cat and the dog sat near the mat")))
      .toDF("doc_id", "text")
    val lp = TfIdf.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // every token of doc 2 is corpus-unique → lowest mean logprob
    assert(lp(2L) < lp.removed(2L).values.min)
    // fixed-point integer sums ⇒ bitwise-identical under repartition
    val re = TfIdf.unigramLogProb(docs.repartition(7), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(re == lp)

    // BM25: "the" is in every doc (near-zero idf) — a term unique to
    // doc 0 must outrank it despite "the"'s higher tf
    val top = TfIdf.bm25TopTerms(docs, "doc_id", "text", 1)
      .filter($"id" === 0L).collect()
    assert(top.length == 1 && top(0).getAs[String]("term") != "the")
  }

  test("chunks: overlapping windows cover every token; short doc = 1 chunk") {
    val docs = Seq(
      "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", // 10 tokens, w=4 s=3 -> 3 chunks
      "a b c", // <= window -> whole doc
      "x1 x2 x3 x4 x5").toDF("text") // n-w=1 -> 2 chunks
    val got = docs.select(TextOps.chunks($"text", 4, 3)).collect()
      .map(_.getSeq[String](0))
    assert(got(0) == Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(got(1) == Seq("a b c"))
    assert(got(2) == Seq("x1 x2 x3 x4", "x4 x5"))
  }

  test("multimodal: stub decode meta is deterministic and typed") {
    val docs = Tables.documents(spark, Sf0001).limit(50)
    val meta = Multimodal.decodeMeta(
      Multimodal.withBinaryPayload(docs, "text"), "doc_id")
    val rows = meta.collect()
    assert(rows.length == 50)
    assert(rows.forall(m => m.n_bytes > 0 && m.width >= 64 && m.channels == 3))
    // deterministic: run twice, same result
    val rows2 = Multimodal.decodeMeta(
      Multimodal.withBinaryPayload(docs, "text"), "doc_id").collect()
    assert(rows.sortBy(_.id).toSeq == rows2.sortBy(_.id).toSeq)
  }

  test("multimodal: HeaderCodec parses real PNG/JPEG/GIF headers " +
      "byte-for-byte and rejects malformed ones to the stub fallback") {
    import graft.operators.Multimodal.HeaderCodec
    def bytes(hex: String): Array[Byte] =
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // PNG 640x480 greyscale (color type 0 -> 1 channel)
    val png = bytes("89504E470D0A1A0A" + "0000000D" + "49484452" +
      "00000280" + "000001E0" + "0800000000" + "00000000")
    assert(HeaderCodec.parse(png).contains(("png", 640, 480, 1)))
    // JPEG with a COM segment BEFORE SOF2 (progressive, marker C2):
    // the walker must skip variable-length segments by their length
    val jpeg = bytes("FFD8" + "FFFE" + "0004" + "4142" + // COM "AB"
      "FFC2" + "000B" + "08" + "0100" + "0200" + "01" + "011100")
    assert(HeaderCodec.parse(jpeg).contains(("jpeg", 512, 256, 1)))
    // GIF87a little-endian 300x200
    assert(HeaderCodec.parse(bytes("474946383761" + "2C01" + "C800"))
      .contains(("gif", 300, 200, 3)))
    // malformed: PNG color type 7 is invalid; JPEG that never reaches
    // an SOF; text bytes — all must fall back (None)
    val badPng = png.clone(); badPng(25) = 7
    assert(HeaderCodec.parse(badPng).isEmpty)
    assert(HeaderCodec.parse(bytes("FFD8" + "FFFE" + "0004" + "4142")).isEmpty)
    assert(HeaderCodec.parse(
      "plain text payload".getBytes("UTF-8")).isEmpty)
  }

  test("multimodal: AudioHeaderCodec walks RIFF chunks (pad bytes, " +
      "extra chunks) and rejects malformed headers to the stub") {
    import graft.operators.Multimodal.AudioHeaderCodec
    def bytes(hex: String): Array[Byte] =
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // canonical 44-byte header: PCM stereo 44100 Hz 16-bit, 8 data
    // bytes -> 8 / (2ch*2B) = 2 frames
    val wav = bytes("52494646" + "2C000000" + "57415645" +
      "666D7420" + "10000000" + "0100" + "0200" + "44AC0000" +
      "10B10200" + "0400" + "1000" +
      "64617461" + "08000000" + "0102030405060708")
    assert(AudioHeaderCodec.parse(wav)
      .contains(("wav", 44100, 2, 16, 2L)))
    // an ODD-sized LIST chunk before fmt: the walker must skip its
    // pad byte or every later offset is off by one
    val padded = bytes("52494646" + "3A000000" + "57415645" +
      "4C495354" + "03000000" + "414243" + "00" + // LIST size 3 + pad
      "666D7420" + "10000000" + "0100" + "0100" + "803E0000" +
      "007D0000" + "0200" + "1000" +
      "64617461" + "06000000" + "010203040506")
    assert(AudioHeaderCodec.parse(padded)
      .contains(("wav", 16000, 1, 16, 3L)))
    // malformed: not RIFF, RIFF-but-not-WAVE, fmt without data,
    // zero block align — all None (stub fallback)
    assert(AudioHeaderCodec.parse("plain text".getBytes("UTF-8")).isEmpty)
    assert(AudioHeaderCodec.parse(
      bytes("52494646" + "04000000" + "41564920")).isEmpty)
    assert(AudioHeaderCodec.parse(bytes("52494646" + "18000000" +
      "57415645" + "666D7420" + "10000000" + "0100" + "0100" +
      "803E0000" + "007D0000" + "0200" + "1000")).isEmpty)
    val zeroAlign = padded.clone()
    assert(AudioHeaderCodec.parse {
      // zero out block-align (offset: 12 + 8+3+1 LIST + 8 fmt hdr + 12)
      val z = zeroAlign.clone(); z(44) = 0; z(45) = 0; z
    }.isEmpty)
  }

  test("multimodal: VideoHeaderCodec box-walks ISO-BMFF (ftyp brand, " +
      "mvhd clock fields, trak count, truncated mdat) and rejects " +
      "malformed streams to the stub") {
    import graft.operators.Multimodal.VideoHeaderCodec
    def bytes(hex: String): Array[Byte] =
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val ftyp = "00000014" + "66747970" + "69736F6D" + "00000200" +
      "6D703431"
    // mvhd v0: timescale 600, duration 3000 -> 5000 ms
    val mvhd = "0000006C" + "6D766864" + "00000000" + "00000000" +
      "00000000" + "00000258" + "00000BB8" + "00010000" + "0100" +
      "0000" + "0000000000000000" +
      "000100000000000000000000" + "000000000001000000000000" +
      "000000000000000040000000" +
      "000000000000000000000000000000000000000000000000" + "00000002"
    val trak = "00000008" + "7472616B"
    // moov with 2 traks: size = 8 + 108 + 16 = 132 = 0x84
    val moov = "00000084" + "6D6F6F76" + mvhd + trak + trak
    assert(VideoHeaderCodec.parse(bytes(ftyp + moov))
      .contains(("isom", 600, 5000L, 2)))
    // trailing mdat whose declared size exceeds the buffer: the
    // header-only ranged-fetch case — accepted once moov parsed
    val truncated = bytes(ftyp + moov + "00100000" + "6D646174" + "0102")
    assert(VideoHeaderCodec.parse(truncated)
      .contains(("isom", 600, 5000L, 2)))
    // malformed: not a box stream; a child box escaping moov's
    // extent; a version-1 mvhd (64-bit clocks, not parsed); a
    // non-mdat box overrunning the buffer
    assert(VideoHeaderCodec.parse("plain text".getBytes("UTF-8")).isEmpty)
    val escape = bytes(ftyp + "00000020" + "6D6F6F76" +
      "000000FF" + "7472616B" + "0000000000000000" +
      "0000000000000000")
    assert(VideoHeaderCodec.parse(escape).isEmpty)
    val v1 = bytes(ftyp +
      ("00000084" + "6D6F6F76" + mvhd.replaceFirst("00000000", "01000000") +
        trak + trak))
    assert(VideoHeaderCodec.parse(v1).isEmpty)
    assert(VideoHeaderCodec.parse(
      bytes(ftyp + "00100000" + "66726565" + "0102")).isEmpty)
  }

  test("multimodal: frame sampling explodes per-frame rows on executors") {
    val docs = Tables.documents(spark, Sf0001).limit(10)
    val frames = Multimodal.sampleFrames(
      Multimodal.withBinaryPayload(docs, "text"), "doc_id", stride = 10)
    val byDoc = frames.collect().groupBy(_.id)
    assert(byDoc.size == 10)
    assert(byDoc.values.forall(f => f.length >= 1 && f.length <= 8))
    assert(byDoc.values.forall(f =>
      f.map(_.frame_idx).toSeq == f.indices.map(_ * 10)))
  }

  test("hashedFeatures: stateless encoder — repeated term sums to " +
      "±count in ONE bucket; features of a doc never change when the " +
      "corpus grows; partitioning-invariant") {
    import graft.operators.TfIdf
    val docs = Seq(
      (1L, "alpha alpha alpha"), // one term ×3 → single bucket, |w|=3
      (2L, "alpha beta"),
      (3L, "gamma delta epsilon zeta")).toDF("doc_id", "text")
    val f = TfIdf.hashedFeatures(docs, "doc_id", "text", dims = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val d1 = f.filter(_._1 == 1L)
    assert(d1.length == 1 && math.abs(d1.head._3) == 3, d1.toSeq)
    // the encoder is stateless: doc 1's features are identical when
    // encoded alone (no fit pass to skew)
    val alone = TfIdf.hashedFeatures(
        docs.filter(col("doc_id") === 1), "doc_id", "text", 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(alone.toSeq == d1.toSeq)
    // partitioning-invariant exact integers
    val re = TfIdf.hashedFeatures(docs.repartition(7), "doc_id", "text", 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(re.sortBy(t => (t._1, t._2)).toSeq ==
      f.sortBy(t => (t._1, t._2)).toSeq)
    // all buckets in range
    assert(f.forall(t => t._2 >= 0 && t._2 < 64))
  }

  test("encodingHealth: planted damage counted per class; clean text " +
      "healthy; damage classes don't cross-fire") {
    val df = Seq(
      (1L, "perfectly clean ascii text."),
      // two replacement chars
      (2L, "lossy � decode � here"),
      // C1 controls: NEL + 0x9F
      (3L, "c1 \u0085 damage \u009F"),
      // mojibake: Ã© (2-byte double-encode), â€™ (3-byte), Â+nbsp
      (4L, "caf\u00C3\u00A9 it\u00E2\u20AC\u2122s \u00C2\u00A0bad"),
      (5L, "")).toDF("doc_id", "text")
    val got = TextOps.encodingHealth(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got(0) == ((0L, 0L, 0L, true)))
    assert(got(1) == ((2L, 0L, 0L, false)))
    assert(got(2) == ((0L, 2L, 0L, false)))
    assert(got(3) == ((0L, 0L, 3L, false)), got(3))
    assert(got(4) == ((0L, 0L, 0L, true)))
  }

  test("readability: hand-computed FK grade/ease floors; empty doc " +
      "NULL; punctuation-free doc counts one sentence") {
    val df = Seq(
      // 9 words, 2 sentences ("." and "!" runs), syllables by vowel
      // runs: the(1) cat(1) sat(1) on(1) the(1) mat(1) it(1) was(1)
      // good(1) = 9
      (1L, "the cat sat on the mat. it was good!"),
      // no sentence punctuation → 1 sentence; zero-vowel word "tsk"
      // contributes 0 syllables
      (2L, "tsk tsk"),
      (3L, "")).toDF("doc_id", "text")
    val got = TextOps.readabilityMetrics(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1: w=9 s=2 syl=9: grade = 390000·9/2 + 11800000·9/9 − 15590000
    //   = 1755000 + 11800000 − 15590000 = −2035000
    // ease = 206835000 − 1015000·9/2 − 84600000·9/9
    //   = 206835000 − 4567500 − 84600000 = 117667500
    assert(got(0).getLong(1) == 9 && got(0).getLong(2) == 2
      && got(0).getLong(3) == 9)
    assert(got(0).getLong(4) == -2035000L, got(0).getLong(4))
    assert(got(0).getLong(5) == 117667500L, got(0).getLong(5))
    // doc 2: w=2 s=1 syl=0: grade = 780000 + 0 − 15590000 = −14810000
    assert(got(1).getLong(2) == 1 && got(1).getLong(3) == 0)
    assert(got(1).getLong(4) == -14810000L)
    // doc 3: empty → 0 words → NULL metrics
    assert(got(2).getLong(1) == 0 && got(2).isNullAt(4) && got(2).isNullAt(5))
  }

  test("repetition: hand-computed n-gram fractions and edge cases") {
    val df = Seq(
      // 2-grams: [a b, b a, a b, b a, a b] -> top "a b" 3/5
      // 3-grams: [a b a, b a b, a b a, b a b] -> all dup: 4/4
      "a b a b a b",
      // 2-grams all distinct: top 1/4; 3-grams distinct: dup 0/3
      "v w x y z",
      // one token: no 2-grams/3-grams
      "solo",
      "").toDF("text")
    val r = graft.expressions.TextRepetition($"text")
    val got = df.select(
      r.getField("n_2grams"), r.getField("top_2gram_frac"),
      r.getField("n_3grams"), r.getField("dup_3gram_frac")).collect()
    assert(got(0).getInt(0) == 5 && got(0).getDouble(1) == 3.0 / 5.0)
    assert(got(0).getInt(2) == 4 && got(0).getDouble(3) == 1.0)
    assert(got(1).getDouble(1) == 0.25 && got(1).getDouble(3) == 0.0)
    assert(got(2).getInt(0) == 0 && got(2).isNullAt(1) && got(2).isNullAt(3))
    assert(got(3).getInt(0) == 0 && got(3).isNullAt(1))
  }

  test("repetition: whitespace runs don't split equal token sequences") {
    val df = Seq("a  b a b", "a b a b").toDF("text")
    val r = graft.expressions.TextRepetition($"text")
    val got = df.select(r.getField("top_2gram_frac")).collect()
    // both texts are the token stream [a b a b]: top 2-gram "a b" 2/3
    assert(got(0).getDouble(0) == got(1).getDouble(0))
    assert(got(0).getDouble(0) == 2.0 / 3.0)
  }

  test("pii redaction: emails, phones, IPv4s scrub; clean text untouched") {
    val df = Seq(
      "mail a.b-c_d@sub.example.co.uk now",
      "call +31 555 0199 or 020-123-4567",
      "host 192.168.1.254 responded",
      "no pii here at all",
      "multi x@y.io and 10.0.0.1 and +1 555 0100 end").toDF("text")
    val got = df.select(
      TextOps.redactPii($"text").as("r"),
      TextOps.piiCount($"text").as("n")).collect()
    assert(got(0).getString(0) == "mail <EMAIL> now" && got(0).getInt(1) == 1)
    assert(got(1).getString(0) == "call <PHONE> or <PHONE>" && got(1).getInt(1) == 2)
    assert(got(2).getString(0) == "host <IP> responded" && got(2).getInt(1) == 1)
    assert(got(3).getString(0) == "no pii here at all" && got(3).getInt(1) == 0)
    assert(got(4).getString(0) == "multi <EMAIL> and <IP> and <PHONE> end"
      && got(4).getInt(1) == 3)
  }

  test("normalize: precomposed == combining forms; ø/ß/non-Latin left alone") {
    val precomposed = "Café" // é as one codepoint
    val combining = "Café" // e + combining acute
    val df = Seq(precomposed, combining, "CAFÉ",
      "naïve Øresund straße",
      "日本語 русский").toDF("text")
    val got = df.select(graft.expressions.TextNormalize($"text"))
      .collect().map(_.getString(0))
    assert(got(0) == "cafe" && got(1) == "cafe" && got(2) == "cafe")
    // ø has no decomposition: folded case only; ß likewise
    assert(got(3) == "naive øresund straße", got(3))
    // non-Latin scripts pass through lowercased; note й→и (breve is a
    // combining mark) — identical to ICU strip_accents, verified vs
    // DuckDB: accent folding is script-agnostic by design
    assert(got(4) == "日本語 русскии")
  }

  test("multimodal: byte-histogram features have fixed length and sum") {
    val docs = Tables.documents(spark, Sf0001).limit(5)
    val feat = Multimodal.withBinaryPayload(docs, "text")
      .select(col("doc_id"), Multimodal.byteHistogramFeatures(col("payload")).as("f"),
        octet_length(col("payload")).as("nb"))
    val rows = feat.collect()
    assert(rows.forall(_.getSeq[Int](1).length == 16))
    // histogram over hex chars: total count = 2 bytes of hex per byte
    assert(rows.forall(r => r.getSeq[Int](1).sum == 2 * r.getInt(2)))
  }
}
