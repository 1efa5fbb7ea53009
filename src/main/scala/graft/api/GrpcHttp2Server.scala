package graft.api

import io.netty.bootstrap.ServerBootstrap
import io.netty.buffer.{ByteBuf, Unpooled}
import io.netty.channel.{ChannelHandlerContext, ChannelInitializer, SimpleChannelInboundHandler}
import io.netty.channel.nio.NioEventLoopGroup
import io.netty.channel.socket.nio.NioServerSocketChannel
import io.netty.handler.codec.http2.{DefaultHttp2DataFrame, DefaultHttp2Headers, DefaultHttp2HeadersFrame, Http2DataFrame, Http2FrameCodecBuilder, Http2HeadersFrame, Http2MultiplexHandler, Http2StreamChannel, Http2StreamFrame}

/** NATIVE gRPC over HTTP/2 (h2c, prior knowledge) — the reference's
  * actual transport (API.gRPC serves standard gRPC from Kestrel,
  * Program.cs:10-23), closing the one wire-level delta the gRPC-Web
  * endpoint left: a stock gRPC client's netty transport can open a
  * cleartext HTTP/2 connection here and exchange the reference's
  * protobuf messages.
  *
  * Built on Netty's HTTP/2 frame codec from the Spark distribution's own
  * classpath (netty-codec-http2 — the SAME codec grpc-java's transport
  * runs on, so interop with it is interop with the stock client's
  * engine). No protobuf/grpc library is involved: messages are the
  * hand-rolled [[VectorProto]] proto3 codec and the reference's
  * `Vector.ToBinary()` payload layout ([[VectorBinary]]).
  *
  * Wire shape per the gRPC HTTP/2 spec:
  *  - request: `POST /Vector/<Method>`, `content-type: application/grpc`,
  *    body = length-prefixed message(s) (1 compression flag byte +
  *    4-byte big-endian length + payload — the same 5-byte prefix
  *    gRPC-Web uses for its message frames);
  *  - response: HEADERS (`:status 200`, `content-type: application/grpc`)
  *    → DATA (one length-prefixed message) → trailing HEADERS carrying
  *    `grpc-status`/`grpc-message` (END_STREAM);
  *  - rpc failures AFTER headers travel in the trailers, like native
  *    gRPC; failures before any payload use the trailers-only form
  *    (single HEADERS frame with both `:status` and `grpc-status`).
  *
  * `GetVectors` stays stock-client-compatible AND driver-bounded: a
  * unary response must be ONE length-prefixed message, so the server
  * makes two `toLocalIterator` passes — the first sums the encoded
  * per-record sizes (O(1) driver memory), then the 5-byte prefix with
  * the exact total goes out and the second pass streams each record's
  * bytes as its own DATA frame. A stock unary client sees one message;
  * the driver never holds more than one record's encoding.
  */
class GrpcHttp2Server(val db: NeighborlySpark, port: Int = 0) {

  private val group = new NioEventLoopGroup(1)
  @volatile private var bound: io.netty.channel.Channel = _

  def start(): Int = {
    val b = new ServerBootstrap()
      .group(group)
      .channel(classOf[NioServerSocketChannel])
      .localAddress("127.0.0.1", port)
      .childHandler(new ChannelInitializer[io.netty.channel.socket.SocketChannel] {
        override def initChannel(ch: io.netty.channel.socket.SocketChannel): Unit = {
          ch.pipeline().addLast(
            Http2FrameCodecBuilder.forServer().build(),
            new Http2MultiplexHandler(new ChannelInitializer[Http2StreamChannel] {
              override def initChannel(sc: Http2StreamChannel): Unit =
                sc.pipeline().addLast(new RpcStreamHandler)
            }))
        }
      })
    bound = b.bind().syncUninterruptibly().channel()
    bound.localAddress().asInstanceOf[java.net.InetSocketAddress].getPort
  }

  def stop(): Unit = {
    if (bound != null) bound.close().syncUninterruptibly()
    group.shutdownGracefully(0, 500, java.util.concurrent.TimeUnit.MILLISECONDS)
      .syncUninterruptibly()
  }

  /** Test-visible: DATA frames written by the streaming GetVectors path
    * (one per record; a buffered reply would count 1). */
  private[api] val streamedFrames = new java.util.concurrent.atomic.AtomicLong

  /** One handler per HTTP/2 stream (Http2MultiplexHandler gives each rpc
    * its own child channel): accumulate DATA until END_STREAM, dispatch,
    * reply. The facade is single-writer; the single-threaded event loop
    * serializes rpcs exactly like the HTTP/1.1 server's serial executor. */
  private final class RpcStreamHandler extends SimpleChannelInboundHandler[Http2StreamFrame] {
    private var path: String = ""
    private val body = new java.io.ByteArrayOutputStream()

    override def channelRead0(ctx: ChannelHandlerContext, frame: Http2StreamFrame): Unit =
      frame match {
        case h: Http2HeadersFrame =>
          path = String.valueOf(h.headers().path())
          if (h.isEndStream) respond(ctx)
        case d: Http2DataFrame =>
          val buf = d.content()
          val arr = new Array[Byte](buf.readableBytes())
          buf.readBytes(arr)
          body.write(arr)
          if (d.isEndStream) respond(ctx)
        case _ => // SETTINGS/WINDOW_UPDATE etc. are the codec's business
      }

    private def grpcHeaders(): DefaultHttp2Headers = {
      val h = new DefaultHttp2Headers()
      h.status("200")
      h.set("content-type", "application/grpc")
      h
    }

    private def trailers(status: Int, message: String = ""): DefaultHttp2Headers = {
      val t = new DefaultHttp2Headers()
      t.setInt("grpc-status", status)
      if (message.nonEmpty) t.set("grpc-message", GrpcWeb.encodeGrpcMessage(message))
      t
    }

    private def lengthPrefix(len: Int): ByteBuf = {
      val b = Unpooled.buffer(5)
      b.writeByte(0).writeInt(len)
      b
    }

    private def respond(ctx: ChannelHandlerContext): Unit = {
      val method = if (path.startsWith("/Vector/")) path.drop(8) else ""
      try {
        val req = GrpcWeb.firstMessage(body.toByteArray)
        if (method == "GetVectors") { streamGetVectors(ctx, req); return }
        val reply = VectorHttpServer.dispatchRpc(db, method, req)
        ctx.write(new DefaultHttp2HeadersFrame(grpcHeaders()))
        ctx.write(new DefaultHttp2DataFrame(
          Unpooled.wrappedBuffer(lengthPrefix(reply.length),
            Unpooled.wrappedBuffer(reply))))
        ctx.writeAndFlush(new DefaultHttp2HeadersFrame(trailers(0), true))
      } catch {
        // nothing written yet → the gRPC trailers-only response form
        case GrpcWeb.StatusException(code, msg) => trailersOnly(ctx, code, msg)
        case e: IllegalArgumentException =>
          trailersOnly(ctx, 2, String.valueOf(e.getMessage))
        case scala.util.control.NonFatal(e) => trailersOnly(ctx, 2, e.toString)
      }
    }

    private def trailersOnly(ctx: ChannelHandlerContext, code: Int, msg: String): Unit = {
      val h = grpcHeaders()
      h.setInt("grpc-status", code)
      if (msg.nonEmpty) h.set("grpc-message", GrpcWeb.encodeGrpcMessage(msg))
      ctx.writeAndFlush(new DefaultHttp2HeadersFrame(h, true))
    }

    /** Two-pass streaming (see class scaladoc): sizes first, then one
      * DATA frame per record under the declared total. Mid-stream
      * failures report through the trailing HEADERS — the same surface a
      * stock client already reads for status. */
    private def streamGetVectors(ctx: ChannelHandlerContext, req: Array[Byte]): Unit = {
      try {
        val sizes = {
          val it = db.vectors.toLocalIterator()
          var total = 0L
          while (it.hasNext)
            total += VectorProto.encodedVectorListItemSize(
              VectorBinary.toBinary(VectorHttpServer.rowToRecord(it.next())))
          total
        }
        require(sizes <= Int.MaxValue, s"GetVectors response exceeds 2 GiB ($sizes B)")
        ctx.write(new DefaultHttp2HeadersFrame(grpcHeaders()))
        ctx.write(new DefaultHttp2DataFrame(lengthPrefix(sizes.toInt)))
        val it = db.vectors.toLocalIterator()
        while (it.hasNext) {
          val item = VectorProto.encodeVectorListItem(
            VectorBinary.toBinary(VectorHttpServer.rowToRecord(it.next())))
          ctx.write(new DefaultHttp2DataFrame(Unpooled.wrappedBuffer(item)))
          streamedFrames.incrementAndGet()
        }
        ctx.writeAndFlush(new DefaultHttp2HeadersFrame(trailers(0), true))
      } catch {
        case GrpcWeb.StatusException(code, msg) =>
          ctx.writeAndFlush(new DefaultHttp2HeadersFrame(trailers(code, msg), true))
        case e: IllegalArgumentException =>
          ctx.writeAndFlush(new DefaultHttp2HeadersFrame(
            trailers(2, String.valueOf(e.getMessage)), true))
        case scala.util.control.NonFatal(e) =>
          ctx.writeAndFlush(new DefaultHttp2HeadersFrame(trailers(2, e.toString), true))
      }
    }
  }
}
