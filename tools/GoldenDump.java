// Golden-fixture dumper: drives the *reference* gorilla-tsc classes
// (compiled from /root/reference, read-only) and prints the compressed
// stream so our from-scratch Python codec can be checked for
// bit-exactness. This file is test tooling only — it contains no codec
// logic of its own.
//
// Usage: java GoldenDump <mode> <blockTs> [predictorSize] < points.txt
//   mode ∈ {v2, v2nc (no close), v2dfcm, v1}
//   stdin: one "ts rawValueBits" pair per line (both signed longs)
//   stdout: JSON {"words": [...signed longs...]} for v2 modes,
//           {"bytes_hex": "..."} for v1.

import java.io.BufferedReader;
import java.io.InputStreamReader;
import java.nio.ByteBuffer;
import java.util.ArrayList;
import java.util.List;

import fi.iki.yak.ts.compression.gorilla.ByteBufferBitOutput;
import fi.iki.yak.ts.compression.gorilla.Compressor;
import fi.iki.yak.ts.compression.gorilla.GorillaCompressor;
import fi.iki.yak.ts.compression.gorilla.LongArrayOutput;
import fi.iki.yak.ts.compression.gorilla.predictors.DifferentialFCM;

public class GoldenDump {
    public static void main(String[] args) throws Exception {
        String mode = args[0];
        long blockTs = Long.parseLong(args[1]);

        List<long[]> points = new ArrayList<>();
        BufferedReader r = new BufferedReader(new InputStreamReader(System.in));
        String line;
        while ((line = r.readLine()) != null) {
            line = line.trim();
            if (line.isEmpty()) continue;
            String[] parts = line.split("\\s+");
            points.add(new long[]{Long.parseLong(parts[0]), Long.parseLong(parts[1])});
        }

        if (mode.startsWith("v2")) {
            LongArrayOutput out = new LongArrayOutput();
            GorillaCompressor c = mode.equals("v2dfcm")
                ? new GorillaCompressor(blockTs, out, new DifferentialFCM(Integer.parseInt(args[2])))
                : new GorillaCompressor(blockTs, out);
            for (long[] p : points) c.addValue(p[0], p[1]);
            long[] words;
            if (mode.equals("v2nc")) {
                words = out.getLongArray();      // snapshot without close()
            } else {
                c.close();
                words = out.getLongArray();
            }
            StringBuilder sb = new StringBuilder("{\"words\": [");
            for (int i = 0; i < words.length; i++) {
                if (i > 0) sb.append(", ");
                sb.append(words[i]);
            }
            sb.append("]}");
            System.out.println(sb);
        } else if (mode.equals("v1")) {
            ByteBufferBitOutput out = new ByteBufferBitOutput();
            Compressor c = new Compressor(blockTs, out);
            for (long[] p : points) c.addValue(p[0], p[1]);
            c.close();
            ByteBuffer bb = out.getByteBuffer();
            bb.flip();
            StringBuilder sb = new StringBuilder("{\"bytes_hex\": \"");
            while (bb.hasRemaining()) sb.append(String.format("%02x", bb.get()));
            sb.append("\"}");
            System.out.println(sb);
        } else {
            throw new IllegalArgumentException("unknown mode " + mode);
        }
    }
}
