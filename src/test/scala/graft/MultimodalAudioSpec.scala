package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Multimodal

/** The REAL audio path: JDK `javax.sound.sampled` WAV decode through the
  * same mapPartitions plumbing the stub oracle checks, plus PCM window
  * features with analytically known answers.
  */
class MultimodalAudioSpec extends SparkSpec {

  /** A genuine RIFF/WAVE container around 16-bit signed little-endian PCM. */
  private def wavBytes(rate: Float, channels: Int, samples: Array[Short]): Array[Byte] = {
    val fmt = new AudioFormat(rate, 16, channels, true, false)
    val buf = ByteBuffer.allocate(samples.length * 2).order(ByteOrder.LITTLE_ENDIAN)
    samples.foreach(buf.putShort)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(buf.array()), fmt, samples.length / channels)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  private def payloadDf(rows: Seq[(Long, Array[Byte])]) = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, b) => Row(i, b) }, 2), schema)
  }

  test("JavaSoundDecoder reads real WAV headers; corrupt payloads degrade") {
    val mono = wavBytes(8000f, 1, Array.fill[Short](1600)(1000))
    val stereo = wavBytes(44100f, 2, Array.fill[Short](882)(-2000)) // 441 frames
    val junk = Array.tabulate[Byte](256)(i => (i * 7).toByte)
    val df = payloadDf(Seq((1L, mono), (2L, stereo), (3L, junk), (4L, null)))

    val got = Multimodal.withAudioMeta(df, "payload", Multimodal.JavaSoundDecoder)
      .select("id", "audio_meta.*").collect().map(r => r.getLong(0) -> r).toMap

    assert(got(1L).getInt(2) === 8000 && got(1L).getInt(3) === 1)
    assert(got(1L).getInt(4) === 16 && got(1L).getLong(5) === 1600L)
    assert(got(1L).getString(6) === "audio/wav")
    assert(got(2L).getInt(2) === 44100 && got(2L).getInt(3) === 2)
    assert(got(2L).getLong(5) === 441L)
    assert(got(3L).getString(6) === "application/octet-stream")
    assert(got(3L).getInt(2) === 0 && got(3L).getLong(5) === 0L)
    assert(got(4L).getInt(1) === 0) // null payload → zero byte_len row, no crash
  }

  test("pcmWindowFeatures: RMS and zero-crossings match analytic values") {
    // constant +1000: rms = 1000/32768 per window, zero crossings = 0
    val const = wavBytes(8000f, 1, Array.fill[Short](1000)(1000))
    // alternating ±8192: rms = 0.25, a crossing at every sample boundary
    val alt = wavBytes(8000f, 1, Array.tabulate[Short](1000)(i => if (i % 2 == 0) 8192 else -8192))
    val df = payloadDf(Seq((1L, const), (2L, alt), (3L, Array[Byte](1, 2, 3))))

    val rows = Multimodal.pcmWindowFeatures(df, "id", "payload", windowFrames = 400)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r).toMap

    // 1000 frames / 400 → windows of 400, 400, 200; junk id=3 emits nothing
    assert(rows.keySet === Set((1L, 0), (1L, 1), (1L, 2), (2L, 0), (2L, 1), (2L, 2)))
    assert(rows((1L, 2)).getInt(2) === 200)
    assert(math.abs(rows((1L, 0)).getDouble(3) - 1000.0 / 32768.0) < 1e-12)
    assert(rows((1L, 1)).getInt(4) === 0)
    assert(math.abs(rows((2L, 0)).getDouble(3) - 0.25) < 1e-12)
    assert(rows((2L, 0)).getInt(4) === 399)
    assert(rows((2L, 2)).getInt(4) === 199)
  }

  test("stereo downmix averages channels") {
    // L=+4000, R=-4000 every frame → mono average 0 → rms 0
    val lr = Array.tabulate[Short](800)(i => if (i % 2 == 0) 4000 else -4000)
    val df = payloadDf(Seq((1L, wavBytes(8000f, 2, lr))))
    val rows = Multimodal.pcmWindowFeatures(df, "id", "payload", windowFrames = 400)
      .collect()
    assert(rows.length === 1 && rows(0).getInt(2) === 400)
    assert(rows(0).getDouble(3) === 0.0)
  }

  test("stub audio decode is deterministic and matches its documented arithmetic") {
    val bytes = "hello audio".getBytes("UTF-8")
    val h = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val (rate, ch, bits, frames, mime) = Multimodal.StubAudioDecoder.decode(bytes)
    assert(rate === 8000 + (((h(0) & 0xff) << 8 | (h(1) & 0xff)) % 40000))
    assert(ch === 1 + (h(4) & 0xff) % 2)
    assert(bits === 8 * (1 + (h(5) & 0xff) % 2))
    assert(frames === bytes.length / (ch * bits / 8))
    assert(mime === "audio/fake")
  }

  test("resamplePcm: sine survives 2x down- and upsampling; output chains; junk degrades") {
    // 200 Hz sine at 8000 Hz, one second
    val srcRate = 8000
    val n = srcRate
    val sine = Array.tabulate(n)(i =>
      (math.sin(2 * math.Pi * 200.0 * i / srcRate) * 30000).toInt.toShort)
    val wav = wavBytes(srcRate.toFloat, 1, sine)
    val df = payloadDf(Seq((1L, wav), (2L, "not audio".getBytes("UTF-8")), (3L, null)))

    val down = Multimodal.resamplePcm(df, "payload", targetHz = 4000)
      .select("id", "resampled", "out_frames", "resample_ok")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Array[Byte]]), r.getInt(2), r.getBoolean(3)))
      .toMap
    assert(down(2L) == ((None, 0, false)) && down(3L) == ((None, 0, false)))
    val (Some(outWav), outFrames, ok) = down(1L)
    assert(ok && outFrames == (n - 1) / 2 + 1, s"got $outFrames frames")

    // decode the re-encoded WAV and check it IS the 200 Hz sine at 4000 Hz
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(outWav))
    assert(ais.getFormat.getFrameRate == 4000f && ais.getFormat.getChannels == 1)
    val data = ais.readAllBytes()
    val worst = (0 until outFrames).map { j =>
      val s = ((data(j * 2 + 1) << 8) | (data(j * 2) & 0xff)).toDouble / 32768.0
      val want = math.sin(2 * math.Pi * 200.0 * j / 4000.0) * (30000.0 / 32768.0)
      math.abs(s - want)
    }.max
    // 16-bit quantization (twice) + linear interpolation of a 200 Hz tone
    // sampled at 8 kHz: interp error ≤ (2πf/sr)²/8 ≈ 0.003
    assert(worst < 0.01, s"resampled sine drifted: worst $worst")

    // upsample back: frame count lands near n again, and the output chains
    // into pcmWindowFeatures unchanged (it is a real WAV)
    val up = Multimodal.resamplePcm(
        payloadDf(Seq((1L, outWav))), "payload", targetHz = 8000)
      .select("out_frames").head().getInt(0)
    assert(math.abs(up - n) <= 2)
    val feats = Multimodal.pcmWindowFeatures(
        Multimodal.resamplePcm(df, "payload", 4000)
          .select(org.apache.spark.sql.functions.col("id"),
            org.apache.spark.sql.functions.col("resampled").as("payload")),
        "id", "payload", windowFrames = 4000)
      .collect()
    assert(feats.length == 1)
    // full-scale-ish sine RMS ≈ amplitude/√2
    val rms = feats.head.getDouble(3)
    assert(math.abs(rms - (30000.0 / 32768.0) / math.sqrt(2.0)) < 0.01, s"rms $rms")
  }
  test("audioFingerprint: volume-invariant, rate-aligned, structure-sensitive, degrade") {
    // amplitude-modulated sine: RMS envelope rises then falls — a real
    // energy structure for the gradient bits to latch onto
    def clip(rate: Int, seconds: Double, gain: Double, envPeriods: Double): Array[Byte] = {
      val n = (rate * seconds).toInt
      val samples = Array.tabulate[Short](n) { i =>
        val t = i.toDouble / rate
        val env = 0.5 * (1.0 - math.cos(2 * math.Pi * envPeriods * i / n))
        (gain * env * 12000.0 * math.sin(2 * math.Pi * 440.0 * t)).toShort
      }
      wavBytes(rate.toFloat, 1, samples)
    }
    val base = clip(8000, 1.0, 1.0, 3.0)
    val quiet = clip(8000, 1.0, 0.25, 3.0)          // same structure, -12 dB
    val resampled = clip(16000, 1.0, 1.0, 3.0)      // same material, 2x rate
    val other = clip(8000, 1.0, 1.0, 11.0)          // different envelope
    val junk = Array.tabulate[Byte](128)(i => (i * 13).toByte)
    val df = payloadDf(Seq(
      (1L, base), (2L, quiet), (3L, resampled), (4L, other), (5L, junk),
      (6L, null.asInstanceOf[Array[Byte]])))
    val got = Multimodal.audioFingerprint(df, "payload")
      .select("id", "afp")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(5L).isEmpty && got(6L).isEmpty, "junk and null degrade to NULL")
    assert(got(1L) == got(2L), "uniform gain must not move a single bit")
    val dResample = java.lang.Long.bitCount(got(1L).get ^ got(3L).get)
    val dOther = java.lang.Long.bitCount(got(1L).get ^ got(4L).get)
    assert(dResample <= 8, s"rate change must stay close, got $dResample bits")
    assert(dOther > 12, s"different envelope must be far, got $dOther bits")
    val pairs = Multimodal.audioNearDupPairs(df, "id", "payload", maxHamming = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)),
      s"gain/rate variants must pair, got $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "different material must not pair")
  }
}
