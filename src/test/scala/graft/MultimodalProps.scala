package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.DecodedImage
import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the pure-JVM raster codec behind the multimodal
  * family: against ARBITRARY rasters (not just the fixture set), the
  * PPM round-trip must be lossless, header tolerance must not alter
  * pixels, corruption must fail loudly, and dHash's upscale invariance
  * (the claim `media_near_dups_phash` rests on) must hold for every
  * image and every integer factor — the nested-floor identity
  * ⌊⌊k·W·x/9⌋/k⌋ = ⌊W·x/9⌋ checked by exhaustion rather than trusted. */
object MultimodalProps extends Properties("Multimodal") {

  private val image: Gen[DecodedImage] = for {
    w <- Gen.chooseNum(1, 24)
    h <- Gen.chooseNum(1, 24)
    px <- Gen.containerOfN[Array, Byte](w * h * 3,
      Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
  } yield DecodedImage(w, h, 255, px)

  private def same(a: DecodedImage, b: DecodedImage): Boolean =
    a.width == b.width && a.height == b.height && a.maxval == b.maxval &&
      java.util.Arrays.equals(a.pixels, b.pixels)

  property("PPM encode/decode round-trips losslessly") =
    Prop.forAll(image) { img =>
      same(Multimodal.decodePpm(Multimodal.encodePpm(img)), img)
    }

  property("header comments and extra whitespace do not alter pixels") =
    Prop.forAll(image) { img =>
      // same raster, deliberately ugly header: comments between every
      // field, mixed whitespace — the parser's tolerance surface
      val ugly = (s"P6 # c1\n# full comment line\n ${img.width}\t# c2\n" +
        s"${img.height}\r\n# c3\n${img.maxval}\n")
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ img.pixels
      same(Multimodal.decodePpm(ugly), img)
    }

  property("truncated pixel block fails loudly, never decodes short") =
    Prop.forAll(image) { img =>
      val whole = Multimodal.encodePpm(img)
      val cut = java.util.Arrays.copyOf(whole, whole.length - 1)
      Prop.throws(classOf[IllegalArgumentException]) {
        Multimodal.decodePpm(cut)
      }
    }

  property("non-P6 magic refuses") =
    Prop.forAll(image) { img =>
      val bytes = Multimodal.encodePpm(img)
      bytes(1) = '5' // P5 = grayscale PGM, not this decoder's format
      Prop.throws(classOf[IllegalArgumentException]) {
        Multimodal.decodePpm(bytes)
      }
    }

  property("resizeNearest to the same size is the identity") =
    Prop.forAll(image) { img =>
      same(Multimodal.resizeNearest(img, img.width, img.height), img)
    }

  property("dHash64 is invariant under exact integer NN upscale") =
    Prop.forAll(image, Gen.chooseNum(1, 5)) { (img, k) =>
      val up = Multimodal.resizeNearest(img, img.width * k, img.height * k)
      Multimodal.dHash64(up) == Multimodal.dHash64(img)
    }

  property("dHash64 depends on content: one extreme pixel flip moves it") =
    // not a collision-resistance claim (dHash is deliberately coarse) —
    // a sanity floor: blanking a whole 9x8 downsample CELL of a bright
    // image must flip at least one gradient bit when width >= 2
    Prop.forAll(Gen.chooseNum(2, 24), Gen.chooseNum(1, 24)) { (w, h) =>
      val bright = DecodedImage(w, h, 255,
        Array.fill[Byte](w * h * 3)(0xff.toByte))
      val dark = bright.pixels.clone()
      // zero the first pixel COLUMN so every downsample row's first
      // cell changes (cell (0, y) maps to source column 0)
      var y = 0
      while (y < h) {
        val o = y * w * 3
        dark(o) = 0; dark(o + 1) = 0; dark(o + 2) = 0
        y += 1
      }
      Multimodal.dHash64(DecodedImage(w, h, 255, dark)) !=
        Multimodal.dHash64(bright)
    }
}
