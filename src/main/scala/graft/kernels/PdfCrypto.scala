package graft.kernels

/** PDF standard security handler primitives (public spec: ISO 32000-1
  * §7.6.3 algorithms 2-5 for RC4/AESV2 revisions 2-4, ISO 32000-2 §7.6.4
  * algorithm 2.B hardened hash for AES-256 revision 6). Used by the
  * extractor to transparently decrypt files whose USER password is empty
  * (the overwhelmingly common case in crawled PDFs: permission-restricted
  * but freely readable) and by the fixture generator to produce real
  * encrypted files for the oracle queries. Password-protected files —
  * /U validation fails for the empty password — stay honestly
  * `unsupported`.
  */
object PdfCrypto {

  /** The spec's 32-byte password padding string (ISO 32000-1 Table 21
    * neighborhood — public constant).
    */
  val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  // getInstance is a provider lookup — at crawl scale the key schedule
  // runs it hundreds of times PER DOCUMENT (50 MD5 rounds for RC4 keys,
  // 64+ AES+SHA rounds per 2.B hash), so digests and ciphers are
  // per-thread reusables. digest() resets the instance after each use.
  private val Digests = new ThreadLocal[java.util.HashMap[String, java.security.MessageDigest]] {
    override def initialValue() = new java.util.HashMap
  }

  private def digest(alg: String): java.security.MessageDigest = {
    val m = Digests.get()
    var d = m.get(alg)
    if (d == null) { d = java.security.MessageDigest.getInstance(alg); m.put(alg, d) }
    d
  }

  def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = digest("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  private def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = digest(alg)
    parts.foreach(d.update)
    d.digest()
  }

  def sha256(b: Array[Byte]): Array[Byte] = sha("SHA-256", b)

  /** RC4 — symmetric, so this is both encrypt and decrypt. */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = new Array[Int](256)
    var i = 0
    while (i < 256) { s(i) = i; i += 1 }
    var j = 0
    i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0
    var y = 0
    var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xff
      y = (y + s(x)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s((s(x) + s(y)) & 0xff)).toByte
      k += 1
    }
    out
  }

  private val AesCbc = new ThreadLocal[javax.crypto.Cipher] {
    override def initialValue() = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
  }

  /** Thread-local AES/CBC cipher re-keyed per use (init is cheap; the
    * provider lookup in getInstance is what must not be per-call).
    */
  private def aesCipher(mode: Int, key: Array[Byte], iv: Array[Byte]) = {
    val c = AesCbc.get()
    c.init(mode, new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c
  }

  /** AES-CBC decrypt of a PDF crypt payload: leading 16-byte IV, PKCS#5
    * padding stripped. None on malformed input.
    */
  def aesDecrypt(key: Array[Byte], data: Array[Byte]): Option[Array[Byte]] =
    try {
      if (data.length < 32 || (data.length % 16) != 0) return None
      val iv = java.util.Arrays.copyOfRange(data, 0, 16)
      val body = java.util.Arrays.copyOfRange(data, 16, data.length)
      val plain = aesCipher(javax.crypto.Cipher.DECRYPT_MODE, key, iv).doFinal(body)
      val padN = plain(plain.length - 1) & 0xff
      if (padN < 1 || padN > 16 || padN > plain.length) None
      else Some(java.util.Arrays.copyOfRange(plain, 0, plain.length - padN))
    } catch { case _: java.security.GeneralSecurityException => None }

  /** AES-CBC encrypt with explicit IV, PKCS#5 padding added (generator). */
  def aesEncrypt(key: Array[Byte], iv: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val padN = 16 - (data.length % 16)
    val padded = data ++ Array.fill[Byte](padN)(padN.toByte)
    iv ++ aesCipher(javax.crypto.Cipher.ENCRYPT_MODE, key, iv).doFinal(padded)
  }

  /** Raw AES-CBC with zero IV and no padding — the /UE //OE wrapping op. */
  def aesNoPad(encrypt: Boolean, key: Array[Byte], data: Array[Byte],
      iv: Array[Byte] = new Array[Byte](16)): Array[Byte] =
    aesCipher(if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE
      else javax.crypto.Cipher.DECRYPT_MODE, key, iv).doFinal(data)

  /** P as the 4 little-endian bytes of the SIGNED 32-bit value. */
  private def pBytes(p: Int): Array[Byte] =
    Array(p, p >> 8, p >> 16, p >> 24).map(_.toByte)

  private def pwPad(pw: Array[Byte]): Array[Byte] =
    if (pw.length >= 32) pw.take(32) else pw ++ Pad.take(32 - pw.length)

  /** Algorithm 2: file encryption key for revisions 2-4. */
  def fileKey(userPw: Array[Byte], o: Array[Byte], p: Int, id0: Array[Byte],
      r: Int, lengthBits: Int, encryptMetadata: Boolean): Array[Byte] = {
    val n = if (r == 2) 5 else math.max(5, math.min(16, lengthBits / 8))
    val tail =
      if (r >= 4 && !encryptMetadata) Array(0xff, 0xff, 0xff, 0xff).map(_.toByte)
      else Array.emptyByteArray
    var key = md5(pwPad(userPw), o.take(32), pBytes(p), id0, tail).take(n)
    if (r >= 3) {
      var i = 0
      while (i < 50) { key = md5(key).take(n); i += 1 }
    }
    key
  }

  /** Algorithm 3: the /O entry (owner password = user password when the
    * owner password is empty, per spec).
    */
  def computeO(ownerPw: Array[Byte], userPw: Array[Byte], r: Int,
      lengthBits: Int): Array[Byte] = {
    val n = if (r == 2) 5 else math.max(5, math.min(16, lengthBits / 8))
    var k = md5(pwPad(if (ownerPw.nonEmpty) ownerPw else userPw))
    if (r >= 3) { var i = 0; while (i < 50) { k = md5(k); i += 1 } }
    val key = k.take(n)
    var o = rc4(key, pwPad(userPw))
    if (r >= 3) {
      var i = 1
      while (i <= 19) {
        o = rc4(key.map(b => (b ^ i).toByte), o)
        i += 1
      }
    }
    o
  }

  /** Algorithms 4/5: the /U entry. R2 = RC4 of the padding; R3/4 = the
    * 20-pass RC4 of MD5(pad ++ id0), 16 significant bytes + 16 arbitrary
    * (zeros here).
    */
  def computeU(key: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] =
    if (r == 2) rc4(key, Pad)
    else {
      var u = md5(Pad, id0)
      var i = 0
      while (i <= 19) {
        u = rc4(key.map(b => (b ^ i).toByte), u)
        i += 1
      }
      u ++ new Array[Byte](16)
    }

  /** Empty-user-password check against /U (algorithm 6 shape): R2 full
    * 32 bytes, R3/4 first 16 bytes are significant.
    */
  def userPasswordIsEmpty(key: Array[Byte], u: Array[Byte], id0: Array[Byte],
      r: Int): Boolean = {
    val expect = computeU(key, id0, r)
    val sig = if (r == 2) 32 else 16
    u.length >= sig && java.util.Arrays.equals(expect.take(sig), u.take(sig))
  }

  /** ISO 32000-2 algorithm 2.B hardened hash (revision 6). `udata` is
    * empty for user-password hashes and the 48-byte /U for owner-password
    * hashes.
    */
  def hash2B(password: Array[Byte], salt: Array[Byte],
      udata: Array[Byte]): Array[Byte] = {
    var k = sha("SHA-256", password, salt, udata)
    // K grows to 48/64 bytes when later rounds pick SHA-384/512; buffers
    // are sized for the max and reused across all 64+ rounds (this hash
    // runs per encrypted document — allocation here is hot-path cost)
    val maxTotal = (password.length + 64 + udata.length) * 64
    val k1 = new Array[Byte](maxTotal)
    val e = new Array[Byte](maxTotal)
    var eLen = 0
    var round = 0
    while (round < 64 || (e(eLen - 1) & 0xff) > round - 32) {
      val blockLen = password.length + k.length + udata.length
      System.arraycopy(password, 0, k1, 0, password.length)
      System.arraycopy(k, 0, k1, password.length, k.length)
      System.arraycopy(udata, 0, k1, password.length + k.length, udata.length)
      val total = blockLen * 64
      var filled = blockLen
      while (filled < total) { // copy-doubling fill of the 64 repeats
        val n = math.min(filled, total - filled)
        System.arraycopy(k1, 0, k1, filled, n)
        filled += n
      }
      eLen = aesCipher(javax.crypto.Cipher.ENCRYPT_MODE,
        k.take(16), k.slice(16, 32)).doFinal(k1, 0, total, e)
      var sum = 0
      var i = 0
      while (i < 16) { sum += e(i) & 0xff; i += 1 }
      val d = digest((sum % 3) match {
        case 0 => "SHA-256"
        case 1 => "SHA-384"
        case _ => "SHA-512"
      })
      d.update(e, 0, eLen)
      k = d.digest()
      round += 1
    }
    k.take(32)
  }

  // ----------------------------------------------------------- decryptors

  /** A ready decryptor: per-object transform of raw stream bytes. */
  final case class Decryptor(aes: Boolean, fileKey: Array[Byte], r: Int) {
    private val Salt = Array[Byte](0x73, 0x41, 0x6c, 0x54) // "sAlT"

    def objectKey(num: Int, gen: Int): Array[Byte] =
      if (r >= 5) fileKey // AES-256: the file key is used directly
      else {
        val numB = Array(num, num >> 8, num >> 16).map(_.toByte)
        val genB = Array(gen, gen >> 8).map(_.toByte)
        val h =
          if (aes) md5(fileKey, numB, genB, Salt)
          else md5(fileKey, numB, genB)
        h.take(math.min(fileKey.length + 5, 16))
      }

    def decrypt(num: Int, gen: Int, data: Array[Byte]): Option[Array[Byte]] =
      if (aes) aesDecrypt(objectKey(num, gen), data)
      else Some(rc4(objectKey(num, gen), data))

    /** Generator-side inverse; `iv` must be 16 bytes for AES. */
    def encrypt(num: Int, gen: Int, data: Array[Byte], iv: Array[Byte]): Array[Byte] =
      if (aes) aesEncrypt(objectKey(num, gen), iv, data)
      else rc4(objectKey(num, gen), data)
  }
}
