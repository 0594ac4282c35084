package graft

import graft.ext.{ManifestFixtures, Manifests}
import org.scalatest.funsuite.AnyFunSuite

/** HLS/DASH manifest parsing: real-world attribute shapes (quoted
  * comma-carrying CODECS, inheritance, self-closing tags), fixture
  * closed-form round-trips, junk fuzz.
  */
class ManifestsSpec extends AnyFunSuite {

  test("HLS master: quoted CODECS with commas, resolution, URI pairing") {
    val m = """#EXTM3U
      |#EXT-X-STREAM-INF:BANDWIDTH=1280000,RESOLUTION=1280x720,CODECS="avc1.64001f,mp4a.40.2",FRAME-RATE=29.97
      |
      |# a comment between the tag and its URI
      |hi/playlist.m3u8
      |#EXT-X-STREAM-INF:BANDWIDTH=640000,CODECS="hvc1.1.6.L93.B0"
      |lo/playlist.m3u8""".stripMargin
    val vs = Manifests.hlsVariantsOrNull(m)
    assert(vs.length === 2)
    assert(vs(0).bandwidth === 1280000L && vs(0).width === 1280 &&
      vs(0).height === 720)
    assert(vs(0).codecs === "avc1.64001f,mp4a.40.2") // comma INSIDE quotes
    assert(vs(0).uri === "hi/playlist.m3u8")
    assert(vs(1).width === 0 && vs(1).uri === "lo/playlist.m3u8")
  }

  test("HLS media: EXTINF durations, media-sequence origin") {
    val m = """#EXTM3U
      |#EXT-X-TARGETDURATION:6
      |#EXT-X-MEDIA-SEQUENCE:117
      |#EXTINF:5.96,Segment Title
      |a/s1.ts
      |#EXTINF:6,
      |a/s2.ts
      |#EXT-X-ENDLIST""".stripMargin
    val ss = Manifests.hlsSegmentsOrNull(m)
    assert(ss.length === 2)
    assert(ss(0).seq === 117L && ss(0).duration === 5.96 && ss(0).uri === "a/s1.ts")
    assert(ss(1).seq === 118L && ss(1).duration === 6.0)
  }

  test("MPD: inheritance (set-level codecs + rep override), both set shapes") {
    val reps = Manifests.mpdRepresentationsOrNull(ManifestFixtures.mpd(13))
    // id 13: nr = 2 + 13%2 = 3 video reps + 1 audio
    assert(reps.length === 4)
    assert(reps(0).id === "v0" && reps(0).codecs === "avc1.4d401f") // inherited
    assert(reps(1).id === "v1" && reps(1).codecs === "avc1.640028") // overridden
    assert(reps(0).media === "video_$RepresentationID$_$Number$.m4s")
    assert(reps(3).id === "a0" && reps(3).mime === "audio/mp4" &&
      reps(3).width === 0 && reps(3).media === "audio_$Number$.m4s")
    assert(reps.forall(_.period === 0))
  }

  test("fixture closed forms round-trip (both playlist kinds, 100 ids)") {
    for (id <- 0L until 100L) {
      if (id % 2 == 0) {
        val vs = Manifests.hlsVariantsOrNull(ManifestFixtures.m3u8(id))
        assert(vs.length === 2 + (id % 3).toInt, s"id=$id")
        vs.zipWithIndex.foreach { case (v, i) =>
          assert(v.bandwidth === 200000 + 150000 * i + 1000 * (id % 7), s"id=$id")
          assert(v.width === 640 + 320 * i && v.height === 360 + 180 * i)
          assert(v.codecs === ManifestFixtures.codecOf(i))
          assert(v.uri === s"v$i/prog_$id.m3u8")
        }
      } else {
        val ss = Manifests.hlsSegmentsOrNull(ManifestFixtures.m3u8(id))
        assert(ss.length === 3 + (id % 4).toInt, s"id=$id")
        ss.zipWithIndex.foreach { case (sg, k) =>
          assert(sg.seq === id % 50 + k && sg.duration === (4 + (id + k) % 3).toDouble)
          assert(sg.uri === s"seg_${id}_$k.ts")
        }
      }
      val reps = Manifests.mpdRepresentationsOrNull(ManifestFixtures.mpd(id))
      assert(reps.length === 3 + (id % 2).toInt, s"id=$id mpd")
    }
  }

  test("HLS: mid-playlist MEDIA-SEQUENCE resets the running counter") {
    // nonconformant but seen in the wild: the tag after some EXTINFs
    // must not retroactively shift the earlier segments' numbers
    val m = """#EXTM3U
      |#EXT-X-MEDIA-SEQUENCE:10
      |#EXTINF:6,
      |s10.ts
      |#EXTINF:6,
      |s11.ts
      |#EXT-X-MEDIA-SEQUENCE:50
      |#EXTINF:6,
      |s50.ts""".stripMargin
    val ss = Manifests.hlsSegmentsOrNull(m)
    assert(ss.map(_.seq).toSeq === Seq(10L, 11L, 50L))
    assert(ss(2).uri === "s50.ts")
  }

  test("MPD: '>' inside a quoted attribute value does not truncate the tag") {
    val m = """<MPD><Period>
      |<AdaptationSet mimeType="video/mp4" label="a &gt; b > c" codecs="avc1.4d401f">
      |<Representation id="v0" bandwidth="500000" width="640" height="360"/>
      |</AdaptationSet>
      |</Period></MPD>""".stripMargin
    val reps = Manifests.mpdRepresentationsOrNull(m)
    assert(reps != null && reps.length === 1)
    assert(reps(0).id === "v0" && reps(0).codecs === "avc1.4d401f" &&
      reps(0).width === 640)
  }

  test("junk and malformed input null, never throw") {
    assert(Manifests.hlsVariantsOrNull(null) === null)
    assert(Manifests.hlsVariantsOrNull("not a playlist") === null)
    assert(Manifests.hlsSegmentsOrNull("#EXTM3U\n#EXT-X-ENDLIST") === null)
    assert(Manifests.mpdRepresentationsOrNull("<html>no</html>") === null)
    assert(Manifests.mpdRepresentationsOrNull("<MPD><Period>") === null)
    val rnd = new scala.util.Random(23)
    for (_ <- 0 until 200) {
      val junk = Array.fill(rnd.nextInt(300))(
        "#<>EXTMPDabc=\",\n/x1".charAt(rnd.nextInt(19))).mkString
      Manifests.hlsVariantsOrNull(junk)
      Manifests.hlsSegmentsOrNull(junk)
      Manifests.mpdRepresentationsOrNull(junk)
    }
  }
}
